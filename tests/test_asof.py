"""Unit tests for the as-of join operator (operators/asof.py).

Golden cases are hand-computed; the catalog-level j10 query is additionally
hash-checked against its DuckDB oracle in test_oracle_parity.py.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.operators.asof import (
    asof_join,
    asof_join_bucketed,
)

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


# -- property test: asof_join vs a direct per-key model ---------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _model_asof(left_rows, right_rows):
    """Most recent right value at-or-before each left ts; max value on ties."""
    out = {}
    for eid, key, lts in left_rows:
        best = None
        for rkey, rts, val in right_rows:
            if rkey != key or rts > lts:
                continue
            if best is None or rts > best[0] or (rts == best[0] and val > best[1]):
                best = (rts, val)
        out[eid] = None if best is None else best[1]
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=1, max_size=25
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20), st.integers(0, 9)),
        max_size=25,
    ),
)
def test_asof_matches_model(spark, left, right):
    left_rows = [
        (i, key, TS(2024, 1, 1) + dt.timedelta(hours=h))
        for i, (key, h) in enumerate(left)
    ]
    right_rows = [
        (key, TS(2024, 1, 1) + dt.timedelta(hours=h), val)
        for key, h, val in right
    ]
    ldf = spark.createDataFrame(
        left_rows, "event_id long, key long, lts timestamp"
    )
    rdf = (
        spark.createDataFrame(right_rows, "key long, rts timestamp, val long")
        if right_rows
        else spark.createDataFrame([], "key long, rts timestamp, val long")
    )
    out = asof_join(ldf, rdf, "key", "key", "lts", "rts", value_cols=["val"])
    got = {r["event_id"]: r["val"] for r in out.collect()}
    expected = _model_asof(left_rows, right_rows)
    assert got == expected
    # the skew-proof bucketed form must agree exactly (4 h buckets split the
    # 20 h span so in-bucket, adjacent-carry, and long-carry paths all fire)
    out_b = asof_join_bucketed(
        ldf, rdf, "key", "key", "lts", "rts", value_cols=["val"],
        bucket_seconds=4 * 3600,
    )
    got_b = {r["event_id"]: r["val"] for r in out_b.collect()}
    assert got_b == expected
