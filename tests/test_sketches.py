"""Accuracy bounds for the sketch aggregation against its exact anchors.

The a22 catalog entry hash-checks within-tolerance BOOLEANS (estimates are
engine-specific, so raw values can't be oracle-compared); this suite pins the
raw production shape (``sketch_stats_raw``) against the hash-checked exact
queries (a19 distinct counts, exact percentile for the same column).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.queries import all_queries
from vmware_sd_wan_velocloud_bi_intake_spark.queries.beyond import sketch_stats_raw
from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table

CATALOG = all_queries()


def test_sketch_distinct_within_rsd(spark, sf_correct):
    approx = {
        r["l_returnflag"]: (r["n_supp_approx"], r["n_part_approx"])
        for r in sketch_stats_raw(spark, sf_correct).collect()
    }
    # exact anchors: the rollup's per-returnflag subtotal level
    # (grouping_level 1 = l_returnflag only, l_linestatus rolled up)
    exact = {
        r["l_returnflag"]: (r["n_supp"], r["n_part"])
        for r in CATALOG["a19_grouping_rollup"].fn(spark, sf_correct).collect()
        if r["grouping_level"] == 1
    }
    assert approx.keys() == exact.keys()
    for flag in exact:
        for a, e in zip(approx[flag], exact[flag]):
            assert abs(a - e) / e < 0.05, (flag, a, e)


def test_sketch_percentiles_within_tolerance(spark, sf_correct):
    approx = {
        r["l_returnflag"]: (r["p50_approx"], r["p90_approx"])
        for r in sketch_stats_raw(spark, sf_correct).collect()
    }
    exact = {
        r["l_returnflag"]: (r["p50"], r["p90"])
        for r in (
            load_table(spark, sf_correct, "lineitem")
            .groupBy("l_returnflag")
            .agg(
                F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
                F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
            )
            .collect()
        )
    }
    for flag in exact:
        for a, e in zip(approx[flag], exact[flag]):
            assert abs(a - e) / e < 0.02, (flag, a, e)
