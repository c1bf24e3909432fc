"""Salted aggregation/join must be result-identical to the unsalted form —
salting changes the physical distribution, never the answer."""

from __future__ import annotations

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
