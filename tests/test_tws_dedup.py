"""transformWithStateInPandas dedup twin (streaming/tws.py).

The processor's LOGIC — the min-id/cumulative fold, the monotone-deadline
timer protocol (delete stale, register new), the watermark clamp, eviction
on fire — is hermetically unit-tested here against a fake handle: the TWS
callback contract is plain Python, so everything except Spark's transport
is coverable without a cluster. The end-to-end integration test (real
RocksDB state store, real timers) SKIPS where the ``protobuf`` package is
absent (Spark's TWS Python state server requires it; this container does
not ship it) — the same environment-gate discipline as the
Pillow-conditional multimodal tests."""

from __future__ import annotations

import pandas as pd
import pytest

from vmware_sd_wan_velocloud_bi_intake_spark.streaming.tws import (
    ROCKSDB_PROVIDER,
    _PROVIDER_KEY,
    DedupProcessor,
    require_tws,
    streaming_exact_dedup_tws,
    tws_available,
)

HOUR_MS = 3_600_000
T0 = pd.Timestamp("2024-01-01 12:00:00")
T0_MS = int(T0.tz_localize("UTC").timestamp() * 1000)


class FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class FakeHandle:
    def __init__(self):
        self.states = {}
        self.live_timers = set()
        self.deleted = []
        self.registered = []

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, FakeValueState())

    def registerTimer(self, ts):
        self.live_timers.add(ts)
        self.registered.append(ts)

    def deleteTimer(self, ts):
        self.live_timers.discard(ts)
        self.deleted.append(ts)


class FakeTimerValues:
    def __init__(self, wm=-1):
        self._wm = wm

    def getCurrentWatermarkInMs(self):
        return self._wm

    def getCurrentProcessingTimeInMs(self):
        return 0


def _batch(rows):
    return pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
        }
    )


def _run(proc, handle, rows, wm=-1):
    out = list(
        proc.handleInputRows(("k1",), iter([_batch(rows)]), FakeTimerValues(wm))
    )
    assert len(out) == 1 and len(out[0]) == 1
    return out[0].iloc[0]


def test_no_ttl_fold_min_id_and_cumulative_count():
    proc = DedupProcessor()
    handle = FakeHandle()
    proc.init(handle)
    r1 = _run(proc, handle, [(10, None), (11, None)])
    assert (r1["keep_id"], r1["dup_count"]) == (10, 2)
    r2 = _run(proc, handle, [(5, None)])
    assert (r2["keep_id"], r2["dup_count"]) == (5, 3)
    assert handle.registered == []  # no timers without a TTL


def test_ttl_timer_protocol_is_monotone_and_deletes_stale():
    proc = DedupProcessor(ttl_ms=HOUR_MS, tz="UTC")
    handle = FakeHandle()
    proc.init(handle)
    # first sighting: timer at t0 + 1h
    _run(proc, handle, [(10, T0), (11, T0)])
    assert handle.live_timers == {T0_MS + HOUR_MS}
    # LATE duplicate (event time 2h earlier): keep_id drops, the deadline
    # must NOT move backwards — and an unchanged deadline re-registers
    # nothing (timer churn is per-key state-store writes)
    r = _run(proc, handle, [(5, T0 - pd.Timedelta(hours=2))])
    assert (r["keep_id"], r["dup_count"]) == (5, 3)
    assert handle.live_timers == {T0_MS + HOUR_MS}
    assert handle.deleted == []
    # fresh sighting 3h later: stale timer deleted, new one registered
    _run(proc, handle, [(20, T0 + pd.Timedelta(hours=3))])
    assert handle.deleted == [T0_MS + HOUR_MS]
    assert handle.live_timers == {T0_MS + 4 * HOUR_MS}


def test_ttl_deadline_clamped_above_watermark():
    """A within-watermark-late first arrival whose last+TTL lands at or
    behind the current watermark must clamp to wm+1 (evict at the first
    opportunity), never register a timer in the past."""
    proc = DedupProcessor(ttl_ms=HOUR_MS, tz="UTC")
    handle = FakeHandle()
    proc.init(handle)
    wm = T0_MS + 10 * HOUR_MS
    _run(proc, handle, [(10, T0)], wm=wm)
    assert handle.live_timers == {wm + 1}


def test_expired_timer_evicts_state():
    proc = DedupProcessor(ttl_ms=HOUR_MS, tz="UTC")
    handle = FakeHandle()
    proc.init(handle)
    _run(proc, handle, [(10, T0)])
    assert handle.states["agg"].exists()

    class _Info:
        def getExpiryTimeInMs(self):
            return T0_MS + HOUR_MS

    out = list(proc.handleExpiredTimer(("k1",), FakeTimerValues(), _Info()))
    assert out == []
    assert not handle.states["agg"].exists()
    # a later duplicate re-enters as a fresh original
    r = _run(proc, handle, [(99, T0 + pd.Timedelta(hours=5))])
    assert (r["keep_id"], r["dup_count"]) == (99, 1)


def test_all_null_ids_raise_the_contract_error():
    proc = DedupProcessor()
    handle = FakeHandle()
    proc.init(handle)
    with pytest.raises(ValueError, match="castable"):
        _run(proc, handle, [(None, None)])


def test_require_tws_rejects_wrong_provider(spark):
    prev = spark.conf.get(_PROVIDER_KEY, "")
    try:
        with pytest.raises(ValueError, match="RocksDB"):
            require_tws(spark)
    finally:
        if prev:
            spark.conf.set(_PROVIDER_KEY, prev)


@pytest.mark.skipif(
    not tws_available(), reason="protobuf not installed (TWS transport)"
)
def test_tws_dedup_matches_batch_twin(spark, tmp_path):
    """End-to-end parity: latest emission per key equals the batch
    exact_dedup_keys result on a fully consumed stream — the same
    contract the applyInPandasWithState twin pins."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vmware_sd_wan_velocloud_bi_intake_spark.operators.dedup import (
        exact_dedup_keys,
    )

    schema = "doc_id long, text string"
    rows = [
        (10, "alpha  beta"),
        (11, "Alpha beta"),
        (12, "gamma delta"),
        (5, "alpha BETA"),
        (13, "epsilon"),
    ]
    stream_dir = tmp_path / "tws_stream"
    stream_dir.mkdir()
    spark.createDataFrame(rows[:3], schema).coalesce(1).write.parquet(
        str(stream_dir / "b000.parquet")
    )
    spark.createDataFrame(rows[3:], schema).coalesce(1).write.parquet(
        str(stream_dir / "b001.parquet")
    )
    prev = spark.conf.get(_PROVIDER_KEY, "")
    spark.conf.set(_PROVIDER_KEY, ROCKSDB_PROVIDER)
    try:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(stream_dir / "*.parquet"))
        )
        q = (
            streaming_exact_dedup_tws(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("tws_dedup")
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        if prev:
            spark.conf.set(_PROVIDER_KEY, prev)
        else:
            spark.conf.unset(_PROVIDER_KEY)
    final = (
        spark.sql("SELECT * FROM tws_dedup")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("dedup_key").orderBy(F.desc("dup_count"))
            ),
        )
        .where("rn = 1")
        .drop("rn")
    )
    expected = exact_dedup_keys(
        spark.createDataFrame(rows, schema), "doc_id", "text"
    )
    assert sorted(map(tuple, final.collect())) == sorted(
        map(tuple, expected.collect())
    )
