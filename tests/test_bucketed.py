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


def test_lsh_index_writer_and_vehicle_plan(spark, sf_smoke, tmp_path_factory):
    """write_lsh_index co-writes the (bucket, n_members) summary, and the
    incremental dedup vehicle's plan evaluates the degenerate-bucket cap
    against that summary — no aggregation over the corpus index anywhere
    (the index appears exactly once: as the candidate equi-join's probe
    side)."""
    from vmware_sd_wan_velocloud_bi_intake_spark.operators.dedup import (
        lsh_bucket_table,
        near_dup_pairs_incremental,
    )
    from vmware_sd_wan_velocloud_bi_intake_spark.sinks.bucketed import (
        write_lsh_index,
    )

    base = tmp_path_factory.mktemp("lsh_index")
    docs = load_table(spark, sf_smoke, "documents")
    corpus = docs.filter("doc_id % 2 = 0")
    batch = docs.filter("doc_id % 2 = 1")
    band_rows = lsh_bucket_table(corpus, "doc_id", "text", 4, 2, 3)
    write_lsh_index(band_rows, "t_lsh_idx", str(base / "idx"), n_buckets=8)
    try:
        index = read_table(spark, "t_lsh_idx")
        summary = read_table(spark, "t_lsh_idx_summary")
        # summary content == direct aggregation of the index
        direct = sorted(
            map(tuple, index.groupBy("bucket").count().collect())
        )
        assert sorted(map(tuple, summary.collect())) == direct

        out = near_dup_pairs_incremental(
            batch, index, "doc_id", "text",
            threshold=0.4, num_hashes=4, bands=2, shingle_n=3,
            corpus_summary=summary,
        )
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        # the index relation feeds exactly one operator (the bucket
        # equi-join); the cap aggregates batch rows + the summary relation
        assert plan.count("default.t_lsh_idx[") == 1
        assert plan.count("default.t_lsh_idx_summary[") == 1
        # results match the in-plan (no-summary) path
        base_out = near_dup_pairs_incremental(
            batch, index, "doc_id", "text",
            threshold=0.4, num_hashes=4, bands=2, shingle_n=3,
        )
        assert sorted(map(tuple, out.collect())) == sorted(
            map(tuple, base_out.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS t_lsh_idx")
        spark.sql("DROP TABLE IF EXISTS t_lsh_idx_summary")
