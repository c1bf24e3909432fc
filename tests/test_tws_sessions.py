"""transformWithStateInPandas session twin (streaming/tws.py
SessionProcessor): gap-clustered fold, output-on-timer protocol (the API
surface the dedup twin doesn't exercise), backward extension, early
separate sessions, stale-timer deletion, watermark clamp — all hermetic
against the fake handle; a model check pins parity with the batch gap
rule over randomized event sequences."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from vmware_sd_wan_velocloud_bi_intake_spark.streaming.tws import (
    SessionProcessor,
    streaming_sessions_tws,
    tws_available,
)

from .test_tws_dedup import FakeHandle, FakeTimerValues

GAP_MS = 10_000
BASE = int(pd.Timestamp("2024-03-01 09:00:00").tz_localize("UTC").timestamp() * 1000)


def _proc():
    proc = SessionProcessor(gap_ms=GAP_MS)
    handle = FakeHandle()
    proc.init(handle)
    return proc, handle


def _batch(offsets_s):
    return pd.DataFrame(
        {"ts": [pd.Timestamp(BASE + int(o * 1000), unit="ms") for o in offsets_s]}
    )


def _run(proc, offsets_s, wm=-1):
    out = list(
        proc.handleInputRows(
            ("u1",), iter([_batch(offsets_s)]), FakeTimerValues(wm)
        )
    )
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame()


def _fire(proc, wm):
    out = list(proc.handleExpiredTimer(("u1",), FakeTimerValues(wm), None))
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame()


def _sessions(df):
    if df.empty:
        return []
    return [
        (
            int(r.session_start.timestamp() * 1000) - BASE,
            int(r.session_end.timestamp() * 1000) - BASE,
            int(r.n_events),
        )
        for r in df.itertuples()
    ]


def test_mid_batch_gap_closes_earlier_session():
    proc, handle = _proc()
    out = _run(proc, [0, 5, 30])  # 5 -> 30 exceeds the 10 s gap
    assert _sessions(out) == [(0, 5_000, 2)]
    # the 30 s event stays open with its timer at last + gap
    assert handle.live_timers == {BASE + 30_000 + GAP_MS}


def test_cross_batch_extension_moves_the_timer():
    proc, handle = _proc()
    assert _run(proc, [0]).empty
    first_deadline = BASE + GAP_MS
    assert handle.live_timers == {first_deadline}
    assert _run(proc, [8]).empty  # within gap: extends, no emission
    assert handle.deleted == [first_deadline]
    assert handle.live_timers == {BASE + 8_000 + GAP_MS}


def test_timer_fire_emits_and_clears():
    proc, handle = _proc()
    _run(proc, [0, 3])
    out = _fire(proc, wm=BASE + 3_000 + GAP_MS + 1)
    assert _sessions(out) == [(0, 3_000, 2)]
    assert not handle.states["sess"].exists()
    assert _fire(proc, wm=BASE + 10 * GAP_MS).empty  # idempotent on empty


def test_backward_extension_and_early_separate_session():
    proc, handle = _proc()
    _run(proc, [60])  # open session at t=60 s
    # a late in-watermark batch: one event extends the open session
    # BACKWARD (55 s, within gap of 60), one is its own EARLIER session
    # (10 s, more than a gap before 55) — closed by its successor
    out = _run(proc, [10, 55])
    assert _sessions(out) == [(10_000, 10_000, 1)]
    st = handle.states["sess"].get()
    assert (st[0], st[1], st[2]) == (BASE + 55_000, BASE + 60_000, 2)


def test_watermark_clamp_never_registers_past_timers():
    proc, handle = _proc()
    wm = BASE + 100_000
    _run(proc, [0], wm=wm)  # deadline 10 s is far behind the watermark
    assert handle.live_timers == {wm + 1}


def test_model_parity_over_random_sequences():
    """Feed shuffled event times one micro-batch at a time (watermark
    trailing far enough that nothing is late-dropped), fire the final
    timer, and compare the full emitted session list with the batch gap
    model: sort, split where gap > threshold."""
    rng = random.Random(7)
    for _ in range(20):
        n = rng.randint(1, 12)
        times = sorted(rng.sample(range(0, 300), n))
        batches = []
        i = 0
        while i < len(times):
            j = rng.randint(i + 1, len(times))
            batches.append(times[i:j])
            i = j
        proc, handle = _proc()
        got = []
        for b in batches:
            got += _sessions(_run(proc, b))
        got += _sessions(_fire(proc, wm=BASE + 10**9))
        # batch model
        want, cur = [], [times[0]]
        for t in times[1:]:
            if (t - cur[-1]) * 1000 <= GAP_MS:
                cur.append(t)
            else:
                want.append((cur[0] * 1000, cur[-1] * 1000, len(cur)))
                cur = [t]
        want.append((cur[0] * 1000, cur[-1] * 1000, len(cur)))
        assert sorted(got) == sorted(want), (times, batches)


@pytest.mark.skipif(
    not tws_available(), reason="protobuf (TWS python transport) not installed"
)
def test_streaming_sessions_tws_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    from vmware_sd_wan_velocloud_bi_intake_spark.streaming.tws import (
        ROCKSDB_PROVIDER,
        _PROVIDER_KEY,
    )

    prev = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, ROCKSDB_PROVIDER)
    try:
        rows = [
            ("u1", pd.Timestamp("2024-03-01 09:00:00")),
            ("u1", pd.Timestamp("2024-03-01 09:00:05")),
            ("u1", pd.Timestamp("2024-03-01 10:00:00")),
            ("u2", pd.Timestamp("2024-03-01 09:30:00")),
        ]
        src = tmp_path / "in"
        src.mkdir()
        spark.createDataFrame(
            rows, "user_id string, ts timestamp"
        ).coalesce(1).write.parquet(str(src / "b0.parquet"))
        stream = (
            spark.readStream.schema("user_id string, ts timestamp")
            .parquet(str(src / "*.parquet"))
        )
        q = (
            streaming_sessions_tws(stream, gap="10 minutes", watermark="0 seconds")
            .writeStream.format("memory")
            .queryName("tws_sessions")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not drain in time"
        got = {
            (r["session_key"], int(r["n_events"]))
            for r in spark.sql("select * from tws_sessions").collect()
        }
        # the 9:00 pair closed by the 10:00 successor's arrival
        assert ("u1", 2) in got
    finally:
        if prev is not None:
            spark.conf.set(_PROVIDER_KEY, prev)


def test_emitted_session_bounds_are_tz_aware_utc():
    """Pins the r9-advice fix: _emit must produce tz-AWARE UTC
    timestamps — Arrow renders naive pandas timestamps in the Spark
    session timezone, so naive emission was only correct under UTC
    sessions; aware instants convert correctly under any session tz."""
    proc, _ = _proc()
    out = _run(proc, [0, 3])
    out2 = _fire(proc, wm=BASE + 3_000 + GAP_MS + 1)
    df = out2 if not out2.empty else out
    for col in ("session_start", "session_end"):
        assert str(df[col].dt.tz) == "UTC", (col, df[col].dtype)
