"""Relational query catalog: scans, projections, joins, aggregations, rollups.

Fixture mapping per FIXTURES.md §2 — e.g. the reference's per-edge link lists
map to lineitem-per-order, the country dim join maps to nation⨝region, the
customer EXISTS rollups map to orders-per-customer.

Determinism discipline: every double output comes from either (a) an exact
decimal aggregate cast to double, or (b) a fixed-operand-order scalar
expression over exact inputs — bit-identical under any partitioning and in
DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.banding import band_by_thresholds, count_band
from ..functions.exact import dec
from ..functions.sanitize import clamp_pct, valid_name
from ..operators.rollups import conditional_counts, flag_rollup
from ..sources.tables import load_table
from .base import Q


# --------------------------------------------------------------------------
# A8/A18/F14: pricing summary — per-flag/status exact sums (TPC-H Q1 shape).
# Reference analog: per-edge link usage sums, powerbi_main_fun.py:2053-2061.
# --------------------------------------------------------------------------
def a08_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(12,2)")
    disc_price = dec("l_extendedprice", 12) * (one - dec("l_discount", 12))
    charge = disc_price * (one + dec("l_tax", 12))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity", 12)).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice", 12)).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (
                F.sum(dec("l_quantity", 12)).cast("double") / F.count("l_quantity")
            ).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


A08_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
    AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
           * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE)
    AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# P7/F2/A16: edge-attribute projection — regex name validation + banding.
# Reference: update_attributes powerbi_main_fun.py:1088-1129.
# --------------------------------------------------------------------------
def p07_edge_attributes(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        F.col("c_custkey"),
        valid_name(F.col("c_name")).alias("name_clean"),
        F.lower(F.col("c_mktsegment")).alias("segment"),
        band_by_thresholds(
            F.col("c_acctbal"), [0.0, 2500.0, 7500.0], ["negative", "low", "mid", "high"]
        ).alias("acctbal_band"),
        F.when(F.col("c_acctbal") > 0, 1).otherwise(0).alias("is_positive_bal"),
    )


P07_ORACLE = """
SELECT
  c_custkey,
  CASE WHEN regexp_full_match(c_name, '[A-Za-z0-9_ -]{1,60}')
       THEN c_name ELSE 'Invalid' END AS name_clean,
  lower(c_mktsegment) AS segment,
  CASE WHEN c_acctbal <= 0.0 THEN 'negative'
       WHEN c_acctbal <= 2500.0 THEN 'low'
       WHEN c_acctbal <= 7500.0 THEN 'mid'
       ELSE 'high' END AS acctbal_band,
  CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS is_positive_bal
FROM customer
"""


# --------------------------------------------------------------------------
# A6/J5: customer rollup — one groupBy replaces 8 EXISTS probes.
# Reference: process_attributes_full_customer powerbi_main_fun.py:281-352,
# inverted EXISTS at fun_mysql_query.py:115-126.
# --------------------------------------------------------------------------
def a06_customer_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    flags = flag_rollup(
        orders,
        "o_custkey",
        {
            "has_urgent": F.col("o_orderpriority") == "1-URGENT",
            "has_open": F.col("o_orderstatus") == "O",
            "has_big_order": F.col("o_totalprice") > 200000.0,
        },
    )
    counts = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.sum(dec("o_totalprice")).cast("double").alias("total_spend"),
    )
    # reference quirk J5: the EXISTS helper returns True when NO row matches
    # (fun_mysql_query.py:124-126) — reproduced as the inverted flag.
    return (
        counts.join(flags, "o_custkey")
        .withColumn("no_urgent_inverted", 1 - F.col("has_urgent"))
    )


A06_ORACLE = """
SELECT
  o_custkey,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
  CAST(MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS INT) AS has_urgent,
  CAST(MAX(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS INT) AS has_open,
  CAST(MAX(CASE WHEN o_totalprice > 200000.0 THEN 1 ELSE 0 END) AS INT) AS has_big_order,
  CAST(1 - MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS INT)
    AS no_urgent_inverted
FROM orders
GROUP BY o_custkey
"""


# --------------------------------------------------------------------------
# J4/F6: broadcast dim join chain — customer ⨝ nation ⨝ region + rollup.
# Reference: country.json region lookup powerbi_main_fun.py:688-690.
# --------------------------------------------------------------------------
def j04_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.groupBy(F.col("r_name").alias("region")).agg(
        F.count("*").alias("n_customers"),
        F.countDistinct("n_nationkey").alias("n_nations"),
        (F.sum(dec("c_acctbal")).cast("double") / F.count("c_acctbal")).alias(
            "avg_acctbal"
        ),
    )


J04_ORACLE = """
SELECT
  r_name AS region,
  COUNT(*) AS n_customers,
  COUNT(DISTINCT n_nationkey) AS n_nations,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) AS avg_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --------------------------------------------------------------------------
# J1: fact ⨝ small dim broadcast join — lineitem ⨝ part, revenue per brand.
# Reference: link metrics ⨝ WAN config links powerbi_main_fun.py:1651-1665.
# --------------------------------------------------------------------------
def j01_metrics_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    one = F.lit(1).cast("decimal(12,2)")
    revenue = dec("l_extendedprice", 12) * (one - dec("l_discount", 12))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left")
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(revenue).cast("double").alias("revenue"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


J01_ORACLE = """
SELECT
  p_brand,
  COUNT(*) AS n_items,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
    AS revenue,
  COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


# --------------------------------------------------------------------------
# J2: left-semi join (EXISTS) — customers having an urgent order.
# Reference: cluster-membership semi-join powerbi_main_fun.py:1421-1426.
# --------------------------------------------------------------------------
def j02_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment")


J02_ORACLE = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
"""


# --------------------------------------------------------------------------
# J8/P2: left-anti join (NOT EXISTS) — customers with no orders, by segment.
# Reference: create-if-missing probes fun_mysql_query.py:129-144; moved-
# customer anti-filter Functions/data_sanitization.py:56-59.
# --------------------------------------------------------------------------
def j08_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers_without_orders"))
    )


J08_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n_customers_without_orders
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


# --------------------------------------------------------------------------
# A5/A7/P11: per-order conditional counts of line-item classes.
# Reference: link-class counting update_recent_link_list
# powerbi_main_fun.py:1536-1600; route counts :384-428.
# --------------------------------------------------------------------------
def a05_class_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return conditional_counts(
        li,
        "l_orderkey",
        {
            "n_returned": F.col("l_returnflag") == "R",
            "n_highdisc": F.col("l_discount") >= 0.05,
            "n_taxfree": F.col("l_tax") == 0.0,
            "n_bulky": F.col("l_quantity") >= 30.0,
        },
    )


A05_ORACLE = """
SELECT
  l_orderkey,
  COUNT(*) AS n_children,
  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
  CAST(SUM(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_highdisc,
  CAST(SUM(CASE WHEN l_tax = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_taxfree,
  CAST(SUM(CASE WHEN l_quantity >= 30.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulky
FROM lineitem
GROUP BY l_orderkey
"""


# --------------------------------------------------------------------------
# A17/A16: threshold banding of order value → tier census.
# Reference: license banding powerbi_main_fun.py:2075-2088; count buckets
# :1374-1381.
# --------------------------------------------------------------------------
def a17_order_banding(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    band = band_by_thresholds(
        F.col("o_totalprice"),
        [50000.0, 100000.0, 150000.0, 200000.0, 300000.0],
        ["tier_50k", "tier_100k", "tier_150k", "tier_200k", "tier_300k", "tier_max"],
    )
    return orders.groupBy(band.alias("price_tier")).agg(
        F.count("*").alias("n_orders"),
        F.sum(dec("o_totalprice")).cast("double").alias("tier_value"),
    )


A17_ORACLE = """
SELECT
  CASE WHEN o_totalprice <= 50000.0 THEN 'tier_50k'
       WHEN o_totalprice <= 100000.0 THEN 'tier_100k'
       WHEN o_totalprice <= 150000.0 THEN 'tier_150k'
       WHEN o_totalprice <= 200000.0 THEN 'tier_200k'
       WHEN o_totalprice <= 300000.0 THEN 'tier_300k'
       ELSE 'tier_max' END AS price_tier,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tier_value
FROM orders
GROUP BY 1
"""


# --------------------------------------------------------------------------
# A18/F14/F16: usage%% with clamp, per supplier.
# Reference: update_license_and_link_usage powerbi_main_fun.py:2063-2070.
# --------------------------------------------------------------------------
def a18_usage_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.count("*").alias("n_items"),
    )
    # reference formula shape: used*8 / (capacity window) * 100, clamped
    usage = per_supp.withColumn(
        "usage_pct",
        clamp_pct(F.col("sum_qty") * F.lit(8.0) / F.lit(60.0 * 60.0 * 8.0 * 5.0) * F.lit(100.0)),
    )
    return usage.select("l_suppkey", "sum_qty", "n_items", "usage_pct")


A18_ORACLE = """
SELECT
  l_suppkey,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  COUNT(*) AS n_items,
  GREATEST(0.0, LEAST(100.0,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * 8.0 / (60.0*60.0*8.0*5.0) * 100.0
  )) AS usage_pct
FROM lineitem
GROUP BY l_suppkey
"""


# --------------------------------------------------------------------------
# T1/F12: staleness gate — recency predicate + modulo cadence.
# Reference: fun_mysql_query.py:40-60 (8-day gate), powerbi_main_fun.py:439
# (6-day cadence).
# --------------------------------------------------------------------------
def t01_staleness_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    asof = F.lit("1998-01-01").cast("date")
    return (
        orders.withColumn("age_days", F.datediff(asof, F.col("o_orderdate")))
        .filter(
            (F.col("o_orderdate") < F.lit("1995-06-01").cast("date"))
            & (F.pmod(F.col("age_days"), F.lit(6)) == 0)
        )
        .select(
            "o_orderkey",
            # dates surface as ISO strings: identical representation in every
            # engine/arrow/pandas bridge (DATE round-trips inconsistently)
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "age_days",
        )
    )


T01_ORACLE = """
SELECT
  o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
  datediff('day', o_orderdate, TIMESTAMP '1998-01-01') AS age_days
FROM orders
WHERE o_orderdate < DATE '1995-06-01'
  AND datediff('day', o_orderdate, TIMESTAMP '1998-01-01') % 6 = 0
"""


# --------------------------------------------------------------------------
# O4/T5: deterministic work-shedding sample — hash-gated refresh.
# Reference: probabilistic 1-in-10 / 1-in-100 refresh powerbi_main_fun.py:
# 271-272, :629-631 (random()); engine uses a content hash so the sample is
# stable across runs and engines.
# --------------------------------------------------------------------------
def o04_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    bucket = F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 1)
    return (
        cust.withColumn("sample_bucket", bucket)
        .filter(F.col("sample_bucket").isin("0", "1"))
        .select("c_custkey", "c_mktsegment", "sample_bucket")
    )


O04_ORACLE = """
SELECT c_custkey, c_mktsegment, substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) AS sample_bucket
FROM customer
WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) IN ('0', '1')
"""


QUERIES: dict[str, Q] = {
    "a08_pricing_summary": Q(
        a08_pricing_summary,
        A08_ORACLE,
        ("A8", "A18", "F14", "S-scan", "P11"),
        "TPC-H Q1-shape exact-decimal pricing summary",
    ),
    "p07_edge_attributes": Q(
        p07_edge_attributes,
        P07_ORACLE,
        ("P7", "F2", "A16"),
        "flat attribute projection with regex validation + banding",
    ),
    "a06_customer_rollup": Q(
        a06_customer_rollup,
        A06_ORACLE,
        ("A6", "J5", "A4"),
        "customer-level any-child flags in one groupBy (incl. inverted-EXISTS quirk)",
    ),
    "j04_region_rollup": Q(
        j04_region_rollup,
        J04_ORACLE,
        ("J4", "F6", "S6"),
        "broadcast dim join chain + region census",
    ),
    "j01_metrics_join": Q(
        j01_metrics_join,
        J01_ORACLE,
        ("J1",),
        "fact⨝dim broadcast join, revenue per brand",
    ),
    "j02_semi_join": Q(j02_semi_join, J02_ORACLE, ("J2", "J3"), "EXISTS as left-semi join"),
    "j08_anti_join": Q(
        j08_anti_join, J08_ORACLE, ("J8", "P2"), "NOT EXISTS as left-anti join"
    ),
    "a05_class_counts": Q(
        a05_class_counts,
        A05_ORACLE,
        ("A5", "A7", "P11", "A1", "A2", "A3"),
        "per-parent conditional counts in one pass",
    ),
    "a17_order_banding": Q(
        a17_order_banding, A17_ORACLE, ("A17", "A16"), "threshold tier banding census"
    ),
    "a18_usage_pct": Q(
        a18_usage_pct, A18_ORACLE, ("A18", "F14", "F16", "A8"), "usage%% with clamp"
    ),
    "t01_staleness_gate": Q(
        t01_staleness_gate,
        T01_ORACLE,
        ("T1", "T2", "F12", "F13", "P13"),
        "staleness + modulo-cadence incremental gate",
    ),
    "o04_hash_sample": Q(
        o04_hash_sample,
        O04_ORACLE,
        ("O4", "T5", "O3"),
        "deterministic hash-bucket work shedding",
    ),
}
