"""Multi-way join queries (TPC-H Q3/Q5/Q10 shapes, adapted to the fixture
columns).

The reference never runs a SQL join (SURVEY §2.3); the catalog's J-family
covers 2-way shapes. These add the 3- to 6-way star joins a BI user runs
daily, exercising Catalyst's join reordering + broadcast selection:

- dims (region/nation) broadcast; facts never shuffle for enrichment,
- fact⨝fact (orders⨝lineitem) shuffles once on the join key,
- aggregation keys reuse the join partitioning where possible.

Revenue sums go through DECIMAL (functions/exact.py discipline) so results
are bit-stable at any parallelism and hash-match the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dec
from ..sources.tables import load_table
from .base import Q

_REV = "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"


def _revenue() -> F.Column:
    one = F.lit(1).cast("decimal(12,2)")
    return dec("l_extendedprice", 12) * (one - dec("l_discount", 12))


# --------------------------------------------------------------------------
# Q3 shape: shipping priority — 3-way join, top-10 unshipped revenue.
# --------------------------------------------------------------------------
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("date")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


Q03_ORACLE = f"""
SELECT o_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1998-03-15'
  AND l_shipdate  > DATE '1998-03-15'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# Q5 shape: local supplier volume — 6-way join (both fact tables + 4 dims),
# customer and supplier constrained to the same nation.
# --------------------------------------------------------------------------
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        region.join(nation, region.r_regionkey == nation.n_regionkey)
        .join(cust, nation.n_nationkey == cust.c_nationkey)
        .join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .groupBy("n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


Q05_ORACLE = f"""
SELECT n_name, CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM region
JOIN nation   ON r_regionkey = n_regionkey
JOIN customer ON n_nationkey = c_nationkey
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01'
  AND o_orderdate <  DATE '1998-01-01'
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# Q10 shape: returned-item reporting — 4-way join, top-20 customers by
# lost revenue.
# --------------------------------------------------------------------------
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


Q10_ORACLE = f"""
SELECT c_custkey, c_name, n_name, c_acctbal,
       CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= DATE '1997-01-01'
  AND o_orderdate <  DATE '1997-07-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# --------------------------------------------------------------------------
# Q18 shape: large-volume orders — semi-join against an aggregate HAVING
# set (the decorrelated IN-subquery form).
# --------------------------------------------------------------------------
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("big_orderkey"))
        .agg(F.sum(dec("l_quantity", 12)).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        orders.join(
            big.select("big_orderkey"), orders.o_orderkey == F.col("big_orderkey")
        )
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(dec("l_quantity", 12)).cast("double").alias("total_qty"))
    )


Q18_ORACLE = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
)
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
"""


# --------------------------------------------------------------------------
# Q17 shape: small-quantity-order revenue — correlated scalar subquery
# (per-part average), decorrelated into an aggregate + join.
# --------------------------------------------------------------------------
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_qty = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(dec("l_quantity", 12)).cast("double") / F.count("l_quantity")).alias(
            "avg_qty"
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.sum(dec("l_extendedprice", 12)).cast("double").alias("total_price"),
            F.count("*").alias("n_lines"),
        )
    )


Q17_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part ON l.l_partkey = p_partkey
JOIN (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity)
           AS avg_qty
  FROM lineitem GROUP BY l_partkey
) a ON l.l_partkey = a.pk
WHERE p_brand = 'Brand#1'
  AND l.l_quantity < 0.5 * a.avg_qty
"""


QUERIES: dict[str, Q] = {
    "q18_large_orders": Q(
        fn=q18_large_orders,
        oracle=Q18_ORACLE,
        ops=("J2", "A8"),
        doc="TPC-H Q18 shape: semi-join against an aggregate HAVING set",
    ),
    "q17_small_quantity": Q(
        fn=q17_small_quantity,
        oracle=Q17_ORACLE,
        ops=("J1", "A8"),
        doc="TPC-H Q17 shape: decorrelated per-part scalar subquery",
    ),
    "q03_shipping_priority": Q(
        fn=q03_shipping_priority,
        oracle=Q03_ORACLE,
        ops=("J1", "A8", "O1"),
        doc="TPC-H Q3 shape: 3-way join, top-10 unshipped revenue",
    ),
    "q05_local_supplier_volume": Q(
        fn=q05_local_supplier_volume,
        oracle=Q05_ORACLE,
        ops=("J1", "J4", "A8"),
        doc="TPC-H Q5 shape: 6-way star join, local-supplier revenue per nation",
    ),
    "q10_returned_items": Q(
        fn=q10_returned_items,
        oracle=Q10_ORACLE,
        ops=("J1", "J4", "A8", "O1"),
        doc="TPC-H Q10 shape: 4-way join, top-20 customers by returned revenue",
    ),
}
