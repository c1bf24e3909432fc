"""Salted aggregation/join must be result-identical to the unsalted form —
salting changes the physical distribution, never the answer."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.operators.skew import (
    salted_broadcast_join,
    salted_sum,
)


def _skewed_df(spark):
    # key 'hot' carries 90% of rows
    rows = [("hot", i, float(i % 7)) for i in range(900)]
    rows += [(f"k{i%10}", i, float(i % 5)) for i in range(100)]
    return spark.createDataFrame(rows, "key string, id long, v double")


def test_salted_sum_matches_plain(spark):
    df = _skewed_df(spark)
    plain = df.groupBy("key").agg(
        F.sum("v").alias("v_sum"),
        F.count("*").cast("long").alias("n_count"),
        F.max("id").alias("id_max"),
        F.min("id").alias("id_min"),
    )
    salted = salted_sum(
        df,
        "key",
        {
            "v_sum": F.sum("v"),
            "n_count": F.count("*").cast("long"),
            "id_max": F.max("id"),
            "id_min": F.min("id"),
        },
        n_salts=16,
        salt_from="id",
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_sum_deterministic_across_runs(spark):
    df = _skewed_df(spark)
    aggs = {"v_sum": F.sum("v")}
    a = sorted(map(tuple, salted_sum(df, "key", aggs, salt_from="id").collect()))
    b = sorted(map(tuple, salted_sum(df, "key", aggs, salt_from="id").collect()))
    assert a == b


def test_salted_broadcast_join_matches_plain(spark):
    fact = _skewed_df(spark)
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(10)],
        "key string, label string",
    )
    plain = fact.join(dim, "key").select("key", "id", "label")
    salted = salted_broadcast_join(fact, dim, "key", n_salts=8, fact_salt_from="id").select(
        "key", "id", "label"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_sum_validates_merge_dispatch(spark):
    """A max aggregate without the _max suffix would re-merge partial
    maxima by SUM — plausible numbers, wrong answer. The r7 guard turns
    all three mis-dispatch shapes into loud errors and keeps the tagged
    forms working."""
    from vmware_sd_wan_velocloud_bi_intake_spark.operators.skew import salted_sum

    df = spark.range(1000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") % 13).alias("v")
    )
    with pytest.raises(ValueError, match="_max suffix"):
        salted_sum(df, "k", {"v_top": F.max("v")})
    with pytest.raises(ValueError, match="not\\s+algebraic"):
        salted_sum(df, "k", {"v_avg": F.avg("v")})
    with pytest.raises(ValueError, match="selects a min re-merge"):
        salted_sum(df, "k", {"v_min": F.max("v")})
    # DISTINCT aggregates slip past head-op dispatch (countDistinct renders
    # as count(DISTINCT x) → head 'count' → SUM re-merge counts a value
    # once per salt it lands in) — must reject on the rendered form
    with pytest.raises(ValueError, match="DISTINCT aggregate"):
        salted_sum(df, "k", {"nv_count": F.countDistinct("v")})
    with pytest.raises(ValueError, match="DISTINCT aggregate"):
        salted_sum(df, "k", {"v_sum": F.sum_distinct(F.col("v"))})
    got = {
        r["k"]: (r["v_max"], r["n_count"], r["v_sum"])
        for r in salted_sum(
            df,
            "k",
            {"v_max": F.max("v"), "n_count": F.count("*"), "v_sum": F.sum("v")},
        ).collect()
    }
    want = {
        r["k"]: (r["v_max"], r["n_count"], r["v_sum"])
        for r in df.groupBy("k")
        .agg(F.max("v").alias("v_max"), F.count("*").alias("n_count"), F.sum("v").alias("v_sum"))
        .collect()
    }
    assert got == want


def test_salted_sum_same_combiner_suffixes_stay_legal(spark):
    """A sum aggregate named *_count (or count named *_sum) re-merges by
    F.sum either way — previously-correct call shapes must not start
    raising (the r7 guard compares combiner FUNCTIONS, not suffixes)."""
    from vmware_sd_wan_velocloud_bi_intake_spark.operators.skew import salted_sum

    df = spark.range(1000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") % 2).alias("is_err")
    )
    got = {
        r["k"]: (r["error_count"], r["total_sum"])
        for r in salted_sum(
            df, "k", {"error_count": F.sum("is_err"), "total_sum": F.count("*")}
        ).collect()
    }
    want = {
        r["k"]: (r["error_count"], r["total_sum"])
        for r in df.groupBy("k")
        .agg(F.sum("is_err").alias("error_count"), F.count("*").alias("total_sum"))
        .collect()
    }
    assert got == want


def test_salted_sum_ignores_distinct_in_lineage(spark):
    """A countDistinct anywhere UPSTREAM of df must not poison the probe:
    only the salted expression itself is checked (the r8 self-review
    reproduction — salting a relation derived from a distinct rollup is
    perfectly mergeable)."""
    facts = spark.range(1000).select(
        (F.col("id") % 7).alias("k"),
        (F.col("id") % 13).alias("v"),
        (F.col("id") % 5).alias("o"),
    )
    dim = facts.groupBy("k").agg(F.countDistinct("o").alias("nd"))
    df = facts.join(dim, "k")
    got = {
        r["k"]: r["v_sum"]
        for r in salted_sum(df, "k", {"v_sum": F.sum("v")}).collect()
    }
    want = {
        r["k"]: r["v_sum"]
        for r in df.groupBy("k").agg(F.sum("v").alias("v_sum")).collect()
    }
    assert got == want
