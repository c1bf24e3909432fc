"""Bucketed-layout tests: the join that shuffles neither side.

Writes orders and lineitem bucketed on the join key, then asserts the
bucket-aware join plan has no Exchange on either input — the pay-the-
shuffle-once-at-write-time layout for repeated big-fact joins.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.sinks.bucketed import (
    read_table,
    write_bucketed,
)
from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_smoke, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, sf_smoke, "orders")
    lineitem = load_table(spark, sf_smoke, "lineitem")
    write_bucketed(
        orders, "b_orders", str(base / "orders"), ["o_orderkey"], 8,
        sort_cols=["o_orderkey"],
    )
    write_bucketed(
        lineitem, "b_lineitem", str(base / "lineitem"), ["l_orderkey"], 8,
        sort_cols=["l_orderkey"],
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    t_orders, t_lineitem = bucketed_tables
    joined = (
        read_table(spark, t_lineitem)
        .join(
            read_table(spark, t_orders),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    # disable broadcast so the plan must pick the co-located join path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    join_part = plan.split("SortMergeJoin", 1)[1] if "SortMergeJoin" in plan else plan
    # neither join input re-shuffles; the only Exchange is the final groupBy
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan


def test_bucketed_join_matches_unbucketed(spark, sf_smoke, bucketed_tables):
    t_orders, t_lineitem = bucketed_tables
    bucketed = (
        read_table(spark, t_lineitem)
        .join(read_table(spark, t_orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    plain = (
        load_table(spark, sf_smoke, "lineitem")
        .join(
            load_table(spark, sf_smoke, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )
