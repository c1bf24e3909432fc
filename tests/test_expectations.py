"""Data-quality expectation gate (plans/expectations.py) over real
profile_table output — clean pass, every violation class, the
all-at-once error report, and the missing-column contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.operators.profile import profile_table
from vmware_sd_wan_velocloud_bi_intake_spark.plans.expectations import (
    ExpectationError,
    check_expectations,
    enforce_expectations,
)
from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table


def test_clean_profile_passes(spark, sf_smoke):
    cust = load_table(spark, sf_smoke, "customer")
    prof = profile_table(cust)
    rules = [
        {"column": "c_custkey", "min_rows": 10, "max_null_frac": 0.0,
         "min_ndv": 10, "min_value": 0},
        {"column": "c_name", "max_null_frac": 0.0, "max_len": 60},
        {"column": "c_mktsegment", "max_ndv": 10},
    ]
    assert check_expectations(prof, rules) == []
    enforce_expectations(prof, rules)  # no raise


def test_each_violation_class_detected(spark):
    df = spark.createDataFrame(
        [(1, None, "aaaa"), (1, None, "bbbb"), (2, None, "cccc")],
        "k long, dead string, s string",
    )
    prof = profile_table(df).collect()
    rules = [
        {"column": "k", "min_rows": 100},                  # too few rows
        {"column": "k", "min_ndv": 50},                    # cardinality collapse
        {"column": "k", "max_value": 1},                   # out of range
        {"column": "dead", "max_null_frac": 0.5},          # nulled-out column
        {"column": "s", "max_len": 2},                     # width blowout
        {"column": "ghost", "max_null_frac": 0.1},         # missing column
    ]
    got = {(v["column"], v["rule"]) for v in check_expectations(prof, rules)}
    assert got == {
        ("k", "min_rows"),
        ("k", "min_ndv"),
        ("k", "max_value"),
        ("dead", "max_null_frac"),
        ("s", "max_len"),
        ("ghost", "column_exists"),
    }


def test_enforce_reports_every_violation_at_once(spark):
    df = spark.createDataFrame([(1, None)], "k long, dead string")
    prof = profile_table(df)
    with pytest.raises(ExpectationError) as e:
        enforce_expectations(
            prof,
            [
                {"column": "k", "min_rows": 10},
                {"column": "dead", "max_null_frac": 0.0},
            ],
        )
    assert len(e.value.violations) == 2
    assert "min_rows" in str(e.value) and "max_null_frac" in str(e.value)


def test_numeric_vs_string_bound_comparison(spark):
    # min/max compare numerically when both sides parse as numbers —
    # '9' < '10' must not pass lexicographically
    df = spark.createDataFrame([(9,), (10,)], "v long")
    prof = profile_table(df).collect()
    assert check_expectations(prof, [{"column": "v", "max_value": 10}]) == []
    bad = check_expectations(prof, [{"column": "v", "max_value": 9}])
    assert [v["rule"] for v in bad] == ["max_value"]
    # string domains compare as strings
    sdf = spark.createDataFrame([("apple",), ("pear",)], "s string")
    sprof = profile_table(sdf).collect()
    assert check_expectations(sprof, [{"column": "s", "min_value": "a"}]) == []
    assert [
        v["rule"]
        for v in check_expectations(sprof, [{"column": "s", "max_value": "m"}])
    ] == ["max_value"]


def test_gate_composes_with_curation_shape(spark, sf_smoke):
    """The motivating use: profile the curated output, gate before
    publishing a version — a collapsed doc_id cardinality fails loudly."""
    docs = load_table(spark, sf_smoke, "documents")
    broken = docs.withColumn("doc_id", F.lit(1).cast("long"))
    prof = profile_table(broken, ["doc_id", "text"])
    with pytest.raises(ExpectationError, match="min_ndv"):
        enforce_expectations(
            prof, [{"column": "doc_id", "min_ndv": 10, "max_null_frac": 0.0}]
        )
