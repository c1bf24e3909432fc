"""Property tests: the engine's islands-based outage analytics must agree
with a direct single-pass model of the reference's loop semantics
(SURVEY.md §7 risk register — W1–W3 are the 'hard part').

The model below implements the DERIVED SPEC (not the reference code): for
each occurrence of a start state s at position i, if seq[i+1] == target the
counter increments and the duration accumulates the full consecutive run of
``target`` starting at i+1. Brownouts use (s=4 → target=2); blackouts sum
(s∈{3,2,4} → target=0). Reference behavior documented at
powerbi_main_fun.py:1709-1775 and :1855-1879.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.operators.sequences import (
    qoe_outage_summary,
)


def model_transition_runs(seq: list[int], start_state: int, target: int):
    """(count, duration_samples) per the derived reference spec."""
    count = 0
    duration = 0
    n = len(seq)
    for i, s in enumerate(seq):
        if s != start_state:
            continue
        if i + 1 < n and seq[i + 1] == target:
            count += 1
            j = i + 1
            while j < n and seq[j] == target:
                duration += 1
                j += 1
    return count, duration


def model_outages(seq: list[int]):
    brownouts, brown_dur = model_transition_runs(seq, 4, 2)
    blackouts = black_dur = 0
    for s in (3, 2, 4):
        c, d = model_transition_runs(seq, s, 0)
        blackouts += c
        black_dur += d
    return {
        "brownouts": brownouts,
        "brownout_samples": brown_dur,
        "blackouts": blackouts,
        "blackout_samples": black_dur,
    }


STATE_SEQ = st.lists(st.sampled_from([0, 2, 3, 4]), min_size=1, max_size=60)


def test_outage_summary_matches_reference_model(spark):
    """Randomized model check, BATCHED: 40 seeded random state sequences
    (same distribution as the former hypothesis strategy, more examples)
    ride ONE relation as distinct user_ids — qoe_outage_summary is
    per-user by construction, so the whole sweep is a single collect
    instead of one Spark action per example (r14 suite re-tiering:
    54 s → ~4 s, identical per-sequence verification)."""
    import random

    rng = random.Random(20240815)
    seqs = {
        uid: [rng.choice([0, 2, 3, 4]) for _ in range(rng.randint(1, 60))]
        for uid in range(40)
    }
    rows = [
        (uid, i, s) for uid, seq in seqs.items() for i, s in enumerate(seq)
    ]
    df = spark.createDataFrame(rows, "user_id int, pos int, state int")
    got = {r["user_id"]: r for r in qoe_outage_summary(df, "user_id", ["pos"]).collect()}
    assert set(got) == set(seqs)
    for uid, seq in seqs.items():
        expected = model_outages(seq)
        for k, v in expected.items():
            assert got[uid][k] == v, f"{k}: spark={got[uid][k]} model={v} seq={seq}"


@pytest.mark.parametrize(
    "seq,brownouts,brown_dur,blackouts,black_dur",
    [
        # hand-computed goldens
        ([4, 2, 2, 4, 2], 2, 3, 0, 0),
        ([2, 4, 2, 2, 4], 1, 2, 0, 0),
        ([3, 0, 0, 2, 0], 0, 0, 2, 3),
        ([4, 0, 0, 0], 0, 0, 1, 3),
        ([0, 0, 0], 0, 0, 0, 0),  # opening black run: no transition into it
        ([4], 0, 0, 0, 0),
        ([4, 2], 1, 1, 0, 0),
        ([2, 2, 4, 4, 2, 0, 2, 0], 1, 1, 2, 2),
    ],
)
def test_outage_goldens(spark, seq, brownouts, brown_dur, blackouts, black_dur):
    rows = [(1, i, s) for i, s in enumerate(seq)]
    df = spark.createDataFrame(rows, "user_id int, pos int, state int")
    got = qoe_outage_summary(df, "user_id", ["pos"]).collect()[0]
    assert (
        got["brownouts"],
        got["brownout_samples"],
        got["blackouts"],
        got["blackout_samples"],
    ) == (brownouts, brown_dur, blackouts, black_dur)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(
        st.floats(min_value=0.0, max_value=200.0, allow_nan=False, width=32),
        min_size=1,
        max_size=12,
    )
)
def test_a09_quirk_fold_matches_sequential_model(spark, values):
    """U3: the order-dependent Score fold — engine `aggregate` fold over the
    ordered series must reproduce the reference's sequential recurrence
      score_k = ((score_{k-1} * (k-1)) + v_k) * 12.5 / k
    bit-for-bit (same operation order, double arithmetic)."""
    import datetime as dt

    from vmware_sd_wan_velocloud_bi_intake_spark.queries.events import (
        a09_score_quirk,
    )

    rows = [
        (i, 7, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), "view", float(v), "{}")
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double, props string"
    )
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = a09_score_quirk(spark, d).collect()
    assert len(got) == 1
    score = 0.0
    for k, v in enumerate(values, start=1):
        score = ((score * (k - 1)) + float(v)) * 12.5 / k
    assert got[0]["score_quirk"] == pytest.approx(score, rel=0, abs=0)
    assert got[0]["n_samples"] == len(values)
