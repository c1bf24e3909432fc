"""Unit tests for the as-of join operator (operators/asof.py).

Golden cases are hand-computed; the catalog-level j10 query is additionally
hash-checked against its DuckDB oracle in test_oracle_parity.py.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.operators.asof import asof_join

TS = dt.datetime


def _collect(df):
    return {
        tuple(r[c] for c in ("event_id",)): r["val"]
        for r in df.collect()
    }


def test_asof_basic_backward_inclusive(spark):
    right = spark.createDataFrame(
        [
            (1, TS(2024, 1, 1), "a"),
            (1, TS(2024, 1, 10), "b"),
            (2, TS(2024, 1, 5), "c"),
        ],
        "key long, rts timestamp, val string",
    )
    left = spark.createDataFrame(
        [
            (100, 1, TS(2024, 1, 9)),   # between a and b -> a
            (101, 1, TS(2024, 1, 10)),  # exactly at b -> b (inclusive)
            (102, 1, TS(2023, 12, 31)), # before any -> null
            (103, 2, TS(2024, 2, 1)),   # after c -> c
            (104, 3, TS(2024, 2, 1)),   # key with no right rows -> null
        ],
        "event_id long, key long, lts timestamp",
    )
    out = asof_join(
        left, right, "key", "key", "lts", "rts", value_cols=["val"]
    )
    got = {r["event_id"]: r["val"] for r in out.collect()}
    assert got == {100: "a", 101: "b", 102: None, 103: "c", 104: None}
    assert out.count() == left.count()  # left-preserving


def test_asof_equal_timestamp_ties_pick_max_value_struct(spark):
    # two right rows at the identical timestamp: deterministic resolution
    # to the maximum value struct, independent of partitioning
    right = spark.createDataFrame(
        [(1, TS(2024, 1, 1), 7), (1, TS(2024, 1, 1), 9)],
        "key long, rts timestamp, ord long",
    )
    left = spark.createDataFrame(
        [(100, 1, TS(2024, 1, 2))], "event_id long, key long, lts timestamp"
    )
    for parts in (1, 8):
        out = asof_join(
            left.repartition(parts),
            right.repartition(parts),
            "key",
            "key",
            "lts",
            "rts",
            value_cols=["ord"],
        )
        assert [r["ord"] for r in out.collect()] == [9]


def test_asof_single_shuffle_plan(spark):
    right = spark.createDataFrame(
        [(1, TS(2024, 1, 1), "a")], "key long, rts timestamp, val string"
    )
    left = spark.createDataFrame(
        [(100, 1, TS(2024, 1, 2))], "event_id long, key long, lts timestamp"
    )
    out = asof_join(left, right, "key", "key", "lts", "rts", value_cols=["val"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly one exchange: the window partitioning; union is narrow
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
