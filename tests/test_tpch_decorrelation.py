"""Decorrelation equivalence for the TPC-H-shape subquery vehicles: the
hand-decorrelated DataFrame plans must agree with CATALYST'S OWN
decorrelation of the literal nested-subquery SQL run on Spark itself.

This is a third, engine-internal check besides the DuckDB oracle: the
same literal SQL, executed by two independent engines, and the
DataFrame rewrite — all three must produce one answer. If the manual
semi/anti rewrite ever diverges from correlated-subquery semantics
(e.g. a NULL-handling slip in the NOT EXISTS arm), this catches it
inside Spark, with no cross-engine noise in the diff."""

from __future__ import annotations

import pytest

from vmware_sd_wan_velocloud_bi_intake_spark.queries.tpch import (
    q18_large_orders,
    q21_waiting_suppliers,
)
from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table

_Q21_LITERAL = """
SELECT s_name, n_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name, n_name
"""


@pytest.fixture()
def tpch_views(spark, sf_correct):
    for t in ("lineitem", "orders", "supplier", "nation", "customer", "part"):
        load_table(spark, sf_correct, t).createOrReplaceTempView(t)
    yield
    for t in ("lineitem", "orders", "supplier", "nation", "customer", "part"):
        spark.catalog.dropTempView(t)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_q21_manual_decorrelation_equals_catalyst(
    spark, sf_correct, tpch_views
):
    manual = q21_waiting_suppliers(spark, sf_correct)
    literal = spark.sql(_Q21_LITERAL)
    m, l = _rows(manual), _rows(literal)
    assert len(m) > 0, "vacuous comparison"
    assert m == l


def test_q18_rider_equals_catalyst_correlated_scalar(
    spark, sf_correct, tpch_views
):
    """The q17 rider's per-part average is a correlated scalar subquery;
    Spark decorrelates the literal form itself — both must agree on the
    single rider row (checked through the full q18 output)."""
    manual = q18_large_orders(spark, sf_correct)
    literal = spark.sql(
        """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty,
       q17.q17_total_price, q17.q17_n_lines
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN lineitem ON o_orderkey = l_orderkey
CROSS JOIN (
  SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
           AS q17_total_price,
         COUNT(*) AS q17_n_lines
  FROM lineitem l
  JOIN part ON l.l_partkey = p_partkey
  WHERE p_brand = 'Brand#1'
    AND l.l_quantity < 0.5 * (
      SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
             / COUNT(l2.l_quantity)
      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
    )
) q17
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
)
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
         q17.q17_total_price, q17.q17_n_lines
"""
    )
    m, l = _rows(manual), _rows(literal)
    assert len(m) > 0
    assert m == l


def test_q21_aggregate_rewrite_equals_anti_join_form(spark, sf_correct):
    """The OTHER standard decorrelation of the Q21 shape — per-order
    supplier-count aggregates instead of self-joins (EXISTS other
    supplier ⟺ countDistinct(supplier) ≥ 2 among the order's lines;
    NOT EXISTS other late supplier ⟺ countDistinct(supplier) == 1 among
    the order's LATE lines, since l1 itself is late) — must agree with
    the vehicle's semi/anti form. Pins the equivalence an optimizer
    would rely on to pick between the two at different cardinalities:
    the aggregate form shuffles lineitem twice into order-grain rows
    (better when lines-per-order is large), the semi/anti form keeps
    line grain (better when the R-filter is very selective)."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_correct, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    orders = load_table(spark, sf_correct, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supplier = load_table(spark, sf_correct, "supplier")
    nation = load_table(spark, sf_correct, "nation")
    ordstats = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp")
    )
    latestats = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_late_supp"))
    )
    agg_form = (
        li.filter(F.col("l_returnflag") == "R")
        .join(ordstats.filter("n_supp >= 2"), "l_orderkey")
        .join(latestats.filter("n_late_supp = 1"), "l_orderkey")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(supplier, F.col("l_suppkey") == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("s_name", "n_name")
        .agg(F.count("*").alias("numwait"))
    )
    a = _rows(agg_form)
    b = _rows(q21_waiting_suppliers(spark, sf_correct))
    assert len(a) > 0
    assert a == b
