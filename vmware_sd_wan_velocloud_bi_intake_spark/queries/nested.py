"""Nested-structure query catalog: array construction, higher-order
functions, element-wise series math, and explode-joins (SURVEY.md §2.2
P8/P9/P12/P14, §2.4 A1–A3/A10–A13, §2.8 F17/F21/F23/F25, §2.3 J6).

The reference's inputs are deeply nested JSON (edges with modules[],
recentLinks[], sample arrays — SURVEY.md §1.1); the flat fixtures stand in by
*constructing* the nested shapes with ``collect_list(struct(...))`` and then
operating on them exactly as the engine would on ingested nested data. The
oracles recompute the same semantics relationally, proving the HOF pipeline
equals its flat-relational meaning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import dec
from ..operators.arrays import kth_highest
from ..sources.tables import load_table
from .base import Q


# --------------------------------------------------------------------------
# P8/P12/A1/A3/F23/F25: per-order nested item array + HOF analytics.
# Reference: module selection powerbi_main_fun.py:1215-1218; route-exit
# filter :407-409; policy counting :1347-1362; VNF extraction :2410-2419.
# --------------------------------------------------------------------------
def p08_nested_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").alias("linenumber"),
                    F.col("l_partkey").alias("partkey"),
                    dec("l_quantity").alias("qty"),
                    F.col("l_returnflag").alias("returnflag"),
                    dec("l_discount").alias("discount"),
                )
            )
        ).alias("items")
    )
    items = F.col("items")
    zero = F.lit(0).cast("decimal(28,2)")
    return nested.select(
        "l_orderkey",
        # A1: array cardinality
        F.size(items).alias("n_items"),
        # P12/P14: filtered-array cardinality
        F.size(F.filter(items, lambda x: x["returnflag"] != F.lit("R"))).alias(
            "n_unreturned"
        ),
        # A5/A7/P11 (former a05_class_counts vehicle): per-parent conditional
        # class counts — as filtered-array cardinalities over the same array
        F.size(F.filter(items, lambda x: x["returnflag"] == F.lit("R"))).alias(
            "n_returned"
        ),
        F.size(F.filter(items, lambda x: x["discount"] >= F.lit(0.05))).alias(
            "n_highdisc"
        ),
        F.size(F.filter(items, lambda x: x["qty"] >= F.lit(30.0))).alias(
            "n_bulky"
        ),
        # P8/F25: first struct by position after sort + nested field access
        F.element_at(items, 1)["partkey"].alias("first_partkey"),
        # A3: aggregate fold (decimal-exact)
        # fold result is re-cast to the accumulator type each step (decimal
        # addition widens precision by 1, which would break the fold contract)
        F.aggregate(
            items,
            zero,
            lambda acc, x: (acc + x["qty"].cast("decimal(28,2)")).cast(
                "decimal(28,2)"
            ),
        )
        .cast("double")
        .alias("total_qty"),
        # A13: count-by-value over the array
        F.size(F.filter(items, lambda x: x["returnflag"] == F.lit("A"))).alias(
            "n_flag_a"
        ),
        # F23: EXISTS-style decision over the array
        F.when(
            F.exists(
                items,
                lambda x: (x["discount"] >= F.lit(0.08)) & (x["qty"] >= F.lit(40)),
            ),
            F.lit("Premium Subscription"),
        )
        .otherwise(F.lit("Enterprise Subscription"))
        .alias("feature_set"),
    )


P08_ORACLE = """
WITH ranked AS (
  SELECT *,
         -- tiebreak order mirrors the struct field order used by the
         -- engine's array_sort (linenumbers are NOT unique per order)
         ROW_NUMBER() OVER (
           PARTITION BY l_orderkey
           ORDER BY l_linenumber, l_partkey, l_quantity, l_returnflag, l_discount
         ) AS rn
  FROM lineitem
)
SELECT
  l_orderkey,
  CAST(COUNT(*) AS INT) AS n_items,
  CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) AS INT) AS n_unreturned,
  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS INT) AS n_returned,
  CAST(SUM(CASE WHEN CAST(l_discount AS DECIMAL(18,2)) >= 0.05 THEN 1 ELSE 0 END) AS INT)
    AS n_highdisc,
  CAST(SUM(CASE WHEN CAST(l_quantity AS DECIMAL(18,2)) >= 30.0 THEN 1 ELSE 0 END) AS INT)
    AS n_bulky,
  MAX(CASE WHEN rn = 1 THEN l_partkey END) AS first_partkey,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS INT) AS n_flag_a,
  CASE WHEN MAX(CASE WHEN CAST(l_discount AS DECIMAL(18,2)) >= 0.08
                      AND CAST(l_quantity AS DECIMAL(18,2)) >= 40 THEN 1 ELSE 0 END) = 1
       THEN 'Premium Subscription' ELSE 'Enterprise Subscription' END AS feature_set
FROM ranked
GROUP BY l_orderkey
"""


# --------------------------------------------------------------------------
# A10/F17: element-wise zip_with sum of two per-key series with null padding.
# Reference: Total_BW_List[i] += bytesTX[i]+bytesRX[i], nulls→0,
# powerbi_main_fun.py:1957-1968.
# --------------------------------------------------------------------------
def _typed_series(ev: DataFrame, event_type: str, alias: str):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.filter(F.col("event_type") == event_type)
        .withColumn("rn", F.row_number().over(w))
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("rn"), dec("value").alias("v")))
            ).alias("__s")
        )
        .select("user_id", F.transform(F.col("__s"), lambda s: s["v"]).alias(alias))
    )


def a10_series_zipsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = _typed_series(ev, "purchase", "arr_a")
    b = _typed_series(ev, "view", "arr_b")
    zero = F.lit(0).cast("decimal(18,2)")
    joined = a.join(b, "user_id", "full").select(
        "user_id",
        F.zip_with(
            F.coalesce(F.col("arr_a"), F.array().cast("array<decimal(18,2)>")),
            F.coalesce(F.col("arr_b"), F.array().cast("array<decimal(18,2)>")),
            lambda x, y: F.coalesce(x, zero) + F.coalesce(y, zero),
        ).alias("bw"),
    )
    return joined.select(
        "user_id", F.posexplode(F.col("bw")).alias("pos0", "bw_dec")
    ).select(
        "user_id",
        (F.col("pos0") + 1).alias("pos"),
        F.col("bw_dec").cast("double").alias("bw"),
    )




# --------------------------------------------------------------------------
# A11/O1: k-th highest from the summed series via array_sort.
# Reference: top-1/5/10 throughput powerbi_main_fun.py:1970-1978.
# --------------------------------------------------------------------------
def a11_kth_from_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = a10_series_zipsum(spark, sf_dir)
    arrs = base.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("pos"), dec("bw").alias("bw")))
        ).alias("__s")
    ).select(
        "user_id", F.transform(F.col("__s"), lambda s: s["bw"]).alias("series")
    )
    return arrs.select(
        "user_id",
        kth_highest(F.col("series"), 1).cast("double").alias("top1"),
        kth_highest(F.col("series"), 5).cast("double").alias("top5"),
        kth_highest(F.col("series"), 10).cast("double").alias("top10"),
    )


A11K_ORACLE = """
WITH p AS (
  SELECT user_id, CAST(value AS DECIMAL(18,2)) AS v,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type = 'purchase'
), vv AS (
  SELECT user_id, CAST(value AS DECIMAL(18,2)) AS v,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type = 'view'
), bw AS (
  SELECT COALESCE(p.user_id, vv.user_id) AS user_id,
         COALESCE(p.v, 0) + COALESCE(vv.v, 0) AS bw
  FROM p FULL OUTER JOIN vv ON p.user_id = vv.user_id AND p.rn = vv.rn
), ranked AS (
  SELECT user_id, bw,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY bw DESC) AS rk
  FROM bw
)
SELECT
  user_id,
  CAST(MAX(CASE WHEN rk = 1 THEN bw END) AS DOUBLE) AS top1,
  CAST(MAX(CASE WHEN rk = 5 THEN bw END) AS DOUBLE) AS top5,
  CAST(MAX(CASE WHEN rk = 10 THEN bw END) AS DOUBLE) AS top10
FROM ranked
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# F24: synthetic row constructor union'd onto a real relation.
# Reference: OVERLAY pseudo-link per edge powerbi_main_fun.py:1673-1697.
# --------------------------------------------------------------------------
def f24_overlay_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    real = per_user.select(
        "user_id",
        F.concat_ws("-", F.col("user_id"), F.lit("REAL")).alias("link_id"),
        F.lit("measured").alias("link_kind"),
        "n_events",
    )
    overlay = per_user.select(
        "user_id",
        F.concat_ws("-", F.col("user_id"), F.lit("OVERLAY")).alias("link_id"),
        F.lit("synthetic").alias("link_kind"),
        F.lit(0).cast("long").alias("n_events"),
    )
    return real.unionByName(overlay)


F24_ORACLE = """
WITH per_user AS (
  SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
)
SELECT user_id, user_id || '-' || 'REAL' AS link_id, 'measured' AS link_kind, n_events
FROM per_user
UNION ALL
SELECT user_id, user_id || '-' || 'OVERLAY' AS link_id, 'synthetic' AS link_kind,
       CAST(0 AS BIGINT) AS n_events
FROM per_user
"""


# NOTE on consolidation (round 2): a10_series_zipsum is no longer its own
# catalog entry — a11_kth_from_series CALLS it as its first stage and its
# oracle re-derives the full zip_with/null-padding semantics, so the A10/F17
# operators stay hash-checked through that lineage. j06_explode_relation's
# explode→relation+concat-key shape (J6/F21) is now driver-checked through
# the medallion query ``med_silver_links`` (queries/medallion.py) on the
# frozen bronze fixture — the same operator on its native nested input.
QUERIES: dict[str, Q] = {
    "p08_nested_items": Q(
        p08_nested_items,
        P08_ORACLE,
        ("P8", "P9", "P12", "P14", "A1", "A2", "A3", "A5", "A7", "P11", "A13", "F23", "F25"),
        "nested item arrays + HOF filter/aggregate/exists + class counts",
    ),
    "a11_kth_from_series": Q(
        a11_kth_from_series,
        A11K_ORACLE,
        ("A11", "O1", "A10", "F17"),
        "zip_with series sum (a10 stage) -> k-th highest sample",
    ),
    "f24_overlay_rows": Q(
        f24_overlay_rows,
        F24_ORACLE,
        ("F24", "S10"),
        "synthetic OVERLAY row construction + union",
    ),
}
