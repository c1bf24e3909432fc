"""The two-phase DEDUP_STREAM_ORACLE replays STREAM semantics, not the
one-shot batch derivation — proven on the one corpus shape where the two
genuinely diverge (VERDICT r10 #1's reason for the rewrite).

Loser-loser chain straddling the arrival split: A≈B (same batch), B≈C
(across the split), A≉C. The one-shot batch run drops doc_b of EVERY
verified pair → survivors {A}. The stream drops B in batch 0, then
probes C against the SURVIVORS only (B is not in the index) → C
survives → survivors {A, C}. The r10 oracle (batch derivation) was
green only because the fixtures happened to contain no such chain; the
r11 oracle must match the stream HERE, where the fixture property is
deliberately violated."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.operators import dedup
from vmware_sd_wan_velocloud_bi_intake_spark.queries.textvec import (
    DEDUP_STREAM_ORACLE,
    _STREAM_SNAP_KNOBS,
    dedup_stream_snapshot,
)

# 20-word docs engineered so the banded-LSH (4 hashes / 2 bands /
# 3-shingles) candidates + τ=0.4 Jaccard verification give exactly the
# pair set {(A,B), (B,C)} — found by deterministic search, asserted
# below rather than trusted. ids are multiples of 5 (the vehicle's
# subset rule); max=10 → midpoint 5 → A,B arrive in batch 0, C in batch 1.
_W = [f"w{i}" for i in range(40)]
_A = " ".join(_W[:20])
_B = " ".join(_W[:16] + _W[20:24])
_C = " ".join(_W[30:35] + (_W[:16] + _W[20:24])[5:])
_ROWS = [(0, _A), (5, _B), (10, _C)]


@pytest.fixture()
def chain_sf_dir(spark, tmp_path):
    sf = tmp_path / "sf_chain"
    sf.mkdir()
    spark.createDataFrame(_ROWS, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(sf / "documents.parquet"))
    return str(sf)


def test_fixture_is_a_loser_loser_chain(spark, chain_sf_dir):
    """Guard the construction: exactly the (A,B) and (B,C) pairs verify.
    If LSH knobs or shingle rules ever change, this fails first with a
    readable message instead of the divergence test silently passing."""
    docs = spark.createDataFrame(_ROWS, "doc_id long, text string")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.near_dup_pairs(
            docs, "doc_id", "text", **_STREAM_SNAP_KNOBS
        ).collect()
    }
    assert pairs == {(0, 5), (5, 10)}, pairs


def test_two_phase_oracle_matches_stream_where_batch_diverges(
    spark, chain_sf_dir
):
    # the REAL streamed vehicle over the chain corpus
    streamed = {
        (r["doc_id"], r["arrived_batch"])
        for r in dedup_stream_snapshot(spark, chain_sf_dir).collect()
    }
    assert streamed == {(0, 0), (10, 1)}, streamed

    # the two-phase oracle agrees with the stream
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM parquet_scan('{chain_sf_dir}/documents.parquet/*.parquet')"
    )
    oracle = {
        (int(doc_id), int(arr))
        for doc_id, _len, arr in con.execute(DEDUP_STREAM_ORACLE).fetchall()
    }
    assert oracle == streamed

    # ...and the ONE-SHOT batch derivation does NOT (doc 10's only pair
    # partner, doc 5, already lost in batch 0 — the batch run still
    # drops 10): this is exactly the fixture-dependence the r10 oracle
    # had and the r11 oracle removed
    docs = spark.createDataFrame(_ROWS, "doc_id long, text string")
    batch_losers = {
        r["doc_b"]
        for r in dedup.near_dup_pairs(
            docs, "doc_id", "text", **_STREAM_SNAP_KNOBS
        ).collect()
    }
    batch_survivors = {0, 5, 10} - batch_losers
    assert batch_survivors == {0}
    assert batch_survivors != {d for d, _ in streamed}


@pytest.mark.parametrize(
    "seed",
    [
        7,
        # extra seeds = slow-tier replications (pytest.ini two-tier rule):
        # one random corpus stays in the default run, the rest run once
        # per round via `-m slow`
        pytest.param(23, marks=pytest.mark.slow),
        pytest.param(41, marks=pytest.mark.slow),
    ],
)
def test_two_phase_oracle_matches_stream_on_random_corpora(
    spark, tmp_path, seed
):
    """Seeded random corpora dense with near-dup clusters and exact
    duplicates (mutation chains over a tiny vocabulary, ids scattered so
    chains straddle the split arbitrarily): the streamed vehicle and the
    two-phase oracle must agree on every one — the 'green at any
    fixture/sf' claim, exercised beyond the shipped fixtures."""
    import numpy as np

    rng = np.random.RandomState(seed)
    vocab = [f"t{i}" for i in range(14)]
    docs: list[list[str]] = []
    for _ in range(8):  # seed docs
        docs.append(list(rng.choice(vocab, size=12)))
    for _ in range(22):  # mutations of earlier docs → near-dup chains
        base = list(docs[rng.randint(len(docs))])
        for _ in range(rng.randint(0, 4)):  # 0 mutations = exact dup
            base[rng.randint(len(base))] = vocab[rng.randint(len(vocab))]
        docs.append(base)
    ids = rng.permutation(len(docs)) * 5  # the vehicle's %5 subset rule
    rows = [(int(i), " ".join(d)) for i, d in zip(ids, docs)]

    sf = tmp_path / f"sf_rand{seed}"
    sf.mkdir()
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(sf / "documents.parquet"))

    streamed = {
        (r["doc_id"], r["arrived_batch"])
        for r in dedup_stream_snapshot(spark, str(sf)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM parquet_scan('{sf}/documents.parquet/*.parquet')"
    )
    oracle = {
        (int(doc_id), int(arr))
        for doc_id, _len, arr in con.execute(DEDUP_STREAM_ORACLE).fetchall()
    }
    assert len(streamed) > 0
    assert streamed == oracle


def test_degenerate_split_single_batch_agrees(spark, tmp_path):
    """No id clears the midpoint (min(id) > max(id)//2): the split writes
    ONE file, the stream delivers everything as micro-batch 0, and the
    oracle's has0 guard labels (and phases) identically — the 'any
    fixture' claim at the split rule's own edge."""
    rows = [(35, "alpha beta gamma delta epsilon zeta"),
            (40, "alpha beta gamma delta epsilon zeta"),  # exact dup
            (45, "totally different words here entirely now")]
    sf = tmp_path / "sf_degen"
    sf.mkdir()
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(sf / "documents.parquet"))

    streamed = {
        (r["doc_id"], r["arrived_batch"])
        for r in dedup_stream_snapshot(spark, str(sf)).collect()
    }
    assert streamed == {(35, 0), (45, 0)}, streamed
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM parquet_scan('{sf}/documents.parquet/*.parquet')"
    )
    oracle = {
        (int(doc_id), int(arr))
        for doc_id, _len, arr in con.execute(DEDUP_STREAM_ORACLE).fetchall()
    }
    assert oracle == streamed
