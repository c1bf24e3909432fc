"""Hierarchical rollups and conditional-count aggregations (SURVEY.md §2.4).

The reference computes customer-level booleans by issuing eight separate
EXISTS probes per customer (A6, ``powerbi_main_fun.py:281-352`` +
``fun_mysql_query.py:115-126``) and per-edge link-class counts with
accumulator loops (A5, ``powerbi_main_fun.py:1536-1600``). Both collapse into
single ``groupBy`` passes here: one shuffle on the parent key computes every
flag/count at once — the canonical map-side-combine aggregation shape that
scales linearly with data volume.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def flag_rollup(
    children: DataFrame, parent_key: str, flags: Mapping[str, Column]
) -> DataFrame:
    """Per-parent 'any child satisfies predicate' flags, 0/1 int columns.

    One groupBy replaces the reference's N EXISTS point-queries (A6/J5).
    ``max(when(pred,1) else 0)`` == BOOL_OR, kept as int for portable typing.
    """
    aggs = [
        F.max(F.when(pred, 1).otherwise(0)).alias(name)
        for name, pred in flags.items()
    ]
    return children.groupBy(parent_key).agg(*aggs)


def conditional_counts(
    children: DataFrame,
    parent_key: str,
    counts: Mapping[str, Column],
    include_total: bool = True,
) -> DataFrame:
    """Per-parent counts of children matching each predicate (A5/A7).

    All predicate classes are evaluated in a single pass with partial
    (map-side) aggregation — no repeated scans per class.
    """
    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)
        for name, pred in counts.items()
    ]
    if include_total:
        aggs.insert(0, F.count("*").alias("n_children"))
    return children.groupBy(parent_key).agg(*aggs)
