"""The a19/a22 restructures must match the fused forms they replaced on
NULLABLE inputs, not just on the NULL-free fixtures: GROUP BY treats a NULL
key as a real group (a plain equi-join stitch would drop it) and
COUNT(DISTINCT) ignores NULL values (a raw distinct-triple count would
include them). Verified directly against Spark's native rollup /
single-aggregate forms on data engineered to hit both edges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.functions.exact import dec
from vmware_sd_wan_velocloud_bi_intake_spark.queries.beyond import (
    a19_grouping_rollup,
    a22_sketch_stats,
)

ROWS = [
    # (returnflag, linestatus, quantity, suppkey, partkey, extendedprice)
    ("A", "F", 1.0, 10, 100, 11.0),
    ("A", "F", 2.0, 10, 101, 12.0),
    ("A", "O", 3.0, 11, 100, 13.0),
    (None, "F", 4.0, None, 200, 14.0),  # NULL group key + NULL distinct value
    (None, "F", 5.0, 12, None, 15.0),
    (None, None, 6.0, 13, 201, 16.0),  # doubly-NULL data group
    ("B", "O", 7.0, None, None, 17.0),  # group whose distinct values are all NULL
]
SCHEMA = (
    "l_returnflag string, l_linestatus string, l_quantity double, "
    "l_suppkey long, l_partkey long, l_extendedprice double"
)


@pytest.fixture(scope="module")
def null_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("null_lineitem")
    spark.createDataFrame(ROWS, SCHEMA).coalesce(1).write.parquet(
        str(d / "lineitem.parquet")
    )
    return str(d)


def _sorted(rows):
    return sorted(tuple(str(v) for v in r) for r in rows)


def test_a19_matches_native_rollup_on_nulls(spark, null_sf_dir):
    df = spark.createDataFrame(ROWS, SCHEMA)
    native = df.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity", 12)).cast("double").alias("sum_qty"),
        F.count("*").alias("n_rows"),
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.grouping_id("l_returnflag", "l_linestatus").alias("grouping_level"),
    )
    got = a19_grouping_rollup(spark, null_sf_dir)
    assert got.columns == native.columns
    assert _sorted(got.collect()) == _sorted(native.collect())


def test_a22_matches_fused_aggregate_on_nulls(spark, null_sf_dir):
    df = spark.createDataFrame(ROWS, SCHEMA)
    fused = df.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
    )
    got = a22_sketch_stats(spark, null_sf_dir)
    # every group survives the branch stitching — including the NULL flag —
    # with the exact distinct counts (0 for the all-NULL group)
    assert _sorted(
        got.select("l_returnflag", "n_rows", "n_supp", "n_part").collect()
    ) == _sorted(fused.collect())
    # and the within-tolerance anchors hold on this data too
    for r in got.collect():
        assert r["supp_within_5pct"] and r["part_within_5pct"]
        assert r["p50_rank_ok"] and r["p90_rank_ok"]


def test_j01_two_pass_matches_fused_on_nulls(spark, tmp_path_factory):
    """The r8 j01 two-pass rewrite must keep the fused countDistinct
    form's null semantics: unmatched lineitems form a real p_brand=NULL
    group (null-safe stitch, not a plain equi-join), and NULL orderkeys
    are ignored by the distinct count (0 for an all-NULL group, never
    inflated, never NULL)."""
    from vmware_sd_wan_velocloud_bi_intake_spark.queries.relational import (
        j01_metrics_join,
    )

    li_rows = [
        # (orderkey, partkey, extendedprice, discount)
        (1, 100, 10.0, 0.1),
        (2, 100, 20.0, 0.0),
        (1, 101, 30.0, 0.2),
        (3, 999, 40.0, 0.0),   # unmatched partkey → p_brand NULL group
        (None, 999, 50.0, 0.0),  # NULL orderkey in the NULL-brand group
        (None, 102, 60.0, 0.1),  # brand whose ONLY orderkey is NULL → 0
    ]
    part_rows = [(100, "BrandA"), (101, "BrandB"), (102, "BrandC")]
    d = tmp_path_factory.mktemp("null_j01")
    spark.createDataFrame(
        li_rows,
        "l_orderkey long, l_partkey long, l_extendedprice double, "
        "l_discount double",
    ).coalesce(1).write.parquet(str(d / "lineitem.parquet"))
    spark.createDataFrame(
        part_rows, "p_partkey long, p_brand string"
    ).coalesce(1).write.parquet(str(d / "part.parquet"))

    li = spark.read.parquet(str(d / "lineitem.parquet"))
    part = spark.read.parquet(str(d / "part.parquet"))
    one = F.lit(1).cast("decimal(12,2)")
    rev = dec("l_extendedprice", 12) * (one - dec("l_discount", 12))
    fused = (
        li.join(part, li.l_partkey == part.p_partkey, "left")
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(rev).cast("double").alias("revenue"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )
    got = j01_metrics_join(spark, str(d))
    assert _sorted(got.collect()) == _sorted(fused.collect())
    by_brand = {r["p_brand"]: r["n_orders"] for r in got.collect()}
    assert by_brand[None] == 1      # order 3 counted, NULL orderkey ignored
    assert by_brand["BrandC"] == 0  # all-NULL orderkeys → 0, not NULL/1
