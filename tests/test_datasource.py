"""Tests for the custom Python DataSource (sources/datasource.py).

Covers the four pushdowns SURVEY §2.1 attributes to the reference's API
source — partition fan-out (T6), interval push (S4), state-predicate push,
projection push (S3) — plus planner-level pushFilters unit semantics.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    IsNotNull,
    LessThan,
)

from vmware_sd_wan_velocloud_bi_intake_spark.sources.datasource import (
    VeloCloudDataSource,
    VeloCloudReader,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(VeloCloudDataSource)


def _edges(spark, **opts):
    r = spark.read.format("velocloud").option("entity", "edges")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_edge_scan_shape_and_partitioning(spark):
    df = _edges(
        spark,
        fleet="vco0,vco1",
        n_enterprises=3,
        projection="site,recentLinks,licenses",
    )
    # FakeVcoTransport yields 4 edges per enterprise
    assert df.count() == 2 * 3 * 4
    assert df.rdd.getNumPartitions() == 6  # one per (vco, enterprise)
    assert dict(df.dtypes)["site"].startswith("struct<lat:double")
    assert dict(df.dtypes)["recentLinks"].startswith("array<struct<")
    # deterministic content: same options -> same rows
    a = sorted(r["logicalId"] for r in df.select("logicalId").collect())
    b = sorted(r["logicalId"] for r in df.select("logicalId").collect())
    assert a == b


def test_projection_option_gates_nested_columns(spark):
    no_proj = _edges(spark, fleet="vco0", n_enterprises=2)
    with_proj = _edges(spark, fleet="vco0", n_enterprises=2, projection="site")
    assert no_proj.filter(F.col("site").isNotNull()).count() == 0
    assert with_proj.filter(F.col("site").isNull()).count() == 0
    assert with_proj.filter(F.col("recentLinks").isNotNull()).count() == 0


def test_edge_state_filter_pushed_and_correct(spark):
    df = _edges(spark, fleet="vco0,vco1", n_enterprises=3)
    full = df.collect()
    expected = sorted(
        r["logicalId"] for r in full if r["edgeState"] == "CONNECTED"
    )
    got_df = df.filter(F.col("edgeState") == "CONNECTED")
    got = sorted(r["logicalId"] for r in got_df.collect())
    assert got == expected and len(got) > 0


def test_event_interval_pushdown_limits_rows(spark):
    df = (
        spark.read.format("velocloud")
        .option("entity", "events")
        .option("fleet", "vco0")
        .option("n_enterprises", "2")
        .load()
    )
    lo = dt.datetime(2024, 1, 5)
    hi = dt.datetime(2024, 1, 9)
    windowed = df.filter((F.col("event_ts") >= F.lit(lo)) & (F.col("event_ts") < F.lit(hi)))
    rows = windowed.collect()
    assert len(rows) > 0
    assert all(lo <= r["event_ts"] < hi for r in rows)
    # same answer as post-filtering the full scan
    assert len(rows) == len(
        [r for r in df.collect() if lo <= r["event_ts"] < hi]
    )


def test_pushfilters_consumes_supported_retains_rest():
    r = VeloCloudReader("events", {"fleet": "vco0", "n_enterprises": "1"})
    keep = IsNotNull(attribute=("event",))
    retained = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(attribute=("event_ts",), value=dt.datetime(2024, 1, 2)),
                LessThan(attribute=("event_ts",), value=dt.datetime(2024, 1, 4)),
                keep,
            ]
        )
    )
    assert retained == [keep]
    assert r.interval_start_ms == 1704153600000
    assert r.interval_end_ms == 1704326400000

    re = VeloCloudReader("edges", {"fleet": "vco0", "n_enterprises": "1"})
    retained_e = list(
        re.pushFilters([EqualTo(attribute=("edgeState",), value="CONNECTED")])
    )
    assert retained_e == []
    assert re.edge_states == ["CONNECTED"]


def test_pushfilters_conjunction_keeps_tightest_bounds():
    # ts >= 2024-02-01 AND ts > 2024-01-01: the LATER lower bound must win
    # (last-wins overwrite would silently widen the interval)
    r = VeloCloudReader("events", {"fleet": "vco0", "n_enterprises": "1"})
    retained = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(attribute=("event_ts",), value=dt.datetime(2024, 2, 1)),
                GreaterThan(attribute=("event_ts",), value=dt.datetime(2024, 1, 1)),
                LessThan(attribute=("event_ts",), value=dt.datetime(2024, 3, 1)),
                LessThan(attribute=("event_ts",), value=dt.datetime(2024, 2, 15)),
            ]
        )
    )
    feb1 = 1706745600000
    feb15 = 1707955200000
    assert r.interval_start_ms == feb1
    assert r.interval_end_ms == feb15
    # the strict > is approximate at ms granularity -> re-yielded for Spark
    assert [type(f).__name__ for f in retained] == ["GreaterThan"]


def test_pushfilters_non_ms_aligned_literal_is_not_consumed():
    # a microsecond-precision literal can't be expressed as an ms interval:
    # the interval must widen (floor start / ceil end) AND the filter must be
    # re-yielded so Spark applies the exact predicate
    r = VeloCloudReader("events", {"fleet": "vco0", "n_enterprises": "1"})
    lo = dt.datetime(2024, 1, 2, microsecond=400)   # 0.4 ms past the boundary
    hi = dt.datetime(2024, 1, 4, microsecond=999400)
    retained = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(attribute=("event_ts",), value=lo),
                LessThan(attribute=("event_ts",), value=hi),
            ]
        )
    )
    assert r.interval_start_ms == 1704153600000        # floored: wider
    assert r.interval_end_ms == 1704326400999 + 1      # ceiled: wider
    assert {type(f).__name__ for f in retained} == {
        "GreaterThanOrEqual", "LessThan",
    }


def test_limit_option_caps_event_rows(spark):
    df = (
        spark.read.format("velocloud")
        .option("entity", "events")
        .option("fleet", "vco0")
        .option("n_enterprises", "1")
        .option("limit", "5")
        .load()
    )
    assert df.count() == 5


def test_stream_reader_micro_batches_and_replay(spark, tmp_path):
    # bounded stream: 2024-01-01 .. 2024-01-08 in 2-day micro-batches
    start_ms = 1704067200000
    end_ms = start_ms + 8 * 24 * 3600 * 1000
    q = (
        spark.readStream.format("velocloud")
        .option("entity", "events")
        .option("fleet", "vco0,vco1")
        .option("n_enterprises", "2")
        .option("start_ms", str(start_ms))
        .option("end_ms", str(end_ms))
        .option("advance_ms", str(2 * 24 * 3600 * 1000))
        .load()
        .writeStream.format("memory")
        .queryName("vc_events")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM vc_events").collect()
    # batch reader over the same window is the ground truth
    batch = (
        spark.read.format("velocloud")
        .option("entity", "events")
        .option("fleet", "vco0,vco1")
        .option("n_enterprises", "2")
        .load()
        .filter(
            (F.col("event_ts") >= F.timestamp_millis(F.lit(start_ms)))
            & (F.col("event_ts") < F.timestamp_millis(F.lit(end_ms)))
        )
        .collect()
    )
    key = lambda r: (r["vco"], r["enterprise_id"], r["event_ts"], r["event"])
    assert sorted(map(key, got)) == sorted(map(key, batch))
    assert len(got) > 0


def test_stream_offsets_are_deterministic_intervals():
    from vmware_sd_wan_velocloud_bi_intake_spark.sources.datasource import (
        VeloCloudStreamReader,
    )

    r = VeloCloudStreamReader(
        {"fleet": "vco0", "n_enterprises": "2", "start_ms": "1000",
         "advance_ms": "500", "end_ms": "1800"}
    )
    assert r.initialOffset() == {"ms": 1000}
    assert r.latestOffset() == {"ms": 1500}
    assert r.latestOffset() == {"ms": 1800}
    assert r.latestOffset() == {"ms": 1800}  # capped: bounded replay terminates
    parts = r.partitions({"ms": 1000}, {"ms": 1500})
    assert len(parts) == 2
    assert {(p.start_ms, p.end_ms) for p in parts} == {(1000, 1500)}


def test_stream_offsets_monotone_after_checkpoint_restart():
    from vmware_sd_wan_velocloud_bi_intake_spark.sources.datasource import (
        VeloCloudStreamReader,
    )

    # simulate a restart: a FRESH reader, but the checkpoint already
    # committed offset 3000 — latestOffset must never regress behind it
    r = VeloCloudStreamReader(
        {"fleet": "vco0", "n_enterprises": "1", "start_ms": "1000",
         "advance_ms": "500", "end_ms": "10000"}
    )
    parts = r.partitions({"ms": 3000}, {"ms": 3500})  # replayed pending batch
    assert parts[0].start_ms == 3000
    nxt = r.latestOffset()
    assert nxt["ms"] >= 3500  # monotone: 3000 (clamped) + advance


def test_restart_offset_rewind_never_refetches_processed_span():
    """Worst restart ordering: the last batch WAS committed, so Spark's first
    call is latestOffset() — the fresh reader regresses (1500 < committed
    3000) and that value lands in the offset log. The _floor clamp must keep
    the rewound span [1500, 3000) out of every subsequent slice."""
    from vmware_sd_wan_velocloud_bi_intake_spark.sources.datasource import (
        VeloCloudStreamReader,
    )

    r = VeloCloudStreamReader(
        {"fleet": "vco0", "n_enterprises": "1", "start_ms": "1000",
         "advance_ms": "500", "end_ms": "10000"}
    )
    assert r.latestOffset() == {"ms": 1500}  # regressed: logged by Spark
    # batch 1: (committed=3000, regressed latest=1500) -> inverted; slices
    # clamp to the floor and the empty interval fetches nothing
    p1 = r.partitions({"ms": 3000}, {"ms": 1500})
    assert all(p.start_ms == 3000 and p.end_ms <= p.start_ms for p in p1)
    # batch 2 starts from the rewound log position 1500 — the clamp must
    # hold the slice start at the committed floor, skipping [1500, 3000)
    nxt = r.latestOffset()
    assert nxt["ms"] >= 3500
    p2 = r.partitions({"ms": 1500}, nxt)
    assert all(p.start_ms == 3000 for p in p2)


def test_degrade_and_retry_on_failed_heavy_call(spark):
    """S2 (Functions/vco_calls.py:178-199): when the full-projection edge
    call fails, the scan retries minus the degradable sub-objects — rows
    arrive with the heavy column null instead of the enterprise vanishing."""
    df = _edges(
        spark,
        fleet="vco0",
        n_enterprises=2,
        projection="site,recentLinks,licenses",
        transport=(
            "vmware_sd_wan_velocloud_bi_intake_spark.sources.fake_transport"
            ":flaky_license_transport"
        ),
    )
    rows = df.collect()
    assert len(rows) == 2 * 4  # nothing lost to the failing heavy call
    assert all(r["licenses"] is None for r in rows)  # degraded away
    assert all(r["site"] is not None for r in rows)  # the rest survived
    # same options against the healthy transport: licenses present — the
    # degradation is the transport's doing, not a projection bug
    healthy = _edges(
        spark, fleet="vco0", n_enterprises=2,
        projection="site,recentLinks,licenses",
    ).collect()
    assert all(r["licenses"] is not None for r in healthy)


def test_degrade_disabled_surfaces_task_error(spark):
    # with the degradable list emptied, the failure must surface as a task
    # error (the transport exception propagates), never as silently-empty
    # partitions
    df = _edges(
        spark,
        fleet="vco0",
        n_enterprises=1,
        projection="licenses",
        degradable="",
        transport=(
            "vmware_sd_wan_velocloud_bi_intake_spark.sources.fake_transport"
            ":flaky_license_transport"
        ),
    )
    with pytest.raises(Exception, match="ApiException"):
        df.collect()
