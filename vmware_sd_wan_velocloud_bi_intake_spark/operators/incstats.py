"""Incremental corpus statistics — mergeable per-batch sketch parts.

``operators.profile.profile_table`` is one full scan; perfect per release,
wrong per micro-batch: a streaming corpus would pay a growing full-corpus
scan every time the expectation gate wants fresh numbers. This module
keeps the statistics MERGEABLE instead — each batch writes one tiny part
row (row count, per-column null count, and a Datasketches HLL sketch
binary per column: ``hll_sketch_agg``, the union-exact sketch family
Spark 4 ships), and the reader folds all parts with ``hll_union_agg`` +
sums into a profile-shaped row set. Reading statistics for a
billion-row stream costs O(batches × columns), never a corpus scan.

Parts follow the engine's replay discipline (streaming/neardup.py): the
``_batch_id``-keyed dynamic partition overwrite makes a foreachBatch
replay rewrite its own part byte-identically instead of double counting.

Estimator note: ndv here is the Datasketches HLL estimate;
``profile_table`` uses Spark's HLL++ (``approx_count_distinct``). Both
are ±~2% but they are DIFFERENT estimators — drift-rule baselines must
come from the same family (ratios of the same estimator are consistent;
a mixed ratio adds the estimators' bias gap). The merged output carries
``min_str``/``max_str``/``max_len`` as None: sketch parts don't track
order statistics, so gates over incremental stats are limited to the
row-count / null-fraction / ndv rule families (check_expectations
reports a violation for value-range rules against a None — loud, not
silent).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stats_part(df: DataFrame, columns: list[str]) -> DataFrame:
    """One-ROW mergeable statistics part over ``df``: total rows plus,
    per column, the null count and an HLL sketch of the non-null values
    (cast to string — one sketch family across types). A single global
    aggregation with map-side partials; the output row is a few KB."""
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"stats_part: unknown columns {missing}")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}")
        )
        aggs.append(
            F.hll_sketch_agg(F.col(c).cast("string")).alias(f"__hll_{c}")
        )
    return df.agg(*aggs)


def write_stats_part(
    df: DataFrame, columns: list[str], parts_dir: str, batch_id: int
) -> None:
    """Publish a batch's part, keyed by ``_batch_id`` via dynamic
    partition overwrite — a foreachBatch replay rewrites its own part
    byte-identically (the at-least-once discipline every batch-keyed
    sink in this engine follows)."""
    spark = df.sparkSession
    part = stats_part(df, columns).withColumn(
        "_batch_id", F.lit(int(batch_id))
    )
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "dynamic")
    try:
        part.write.mode("overwrite").partitionBy("_batch_id").parquet(parts_dir)
    finally:
        if prev is not None:
            spark.conf.set(conf_key, prev)


def merged_stats(
    spark, parts_dir: str, columns: list[str]
) -> list[dict]:
    """Fold every part into profile-shaped rows (the dict form
    ``check_expectations`` consumes): counts SUM — exactly, independent
    of batching — and sketches UNION, whose ESTIMATE is
    batching-sensitive within the sketch's ±2% (Datasketches HLL
    promotes sparse→dense at representation-dependent points, so the
    union of four quarter sketches and one full sketch can disagree by
    a count or two; pad ndv drift rules accordingly, same as
    profile_table's HLL++ caveat). O(batches) rows in, ``len(columns)``
    dicts out; the corpus is never touched.
    """
    if not os.path.isdir(parts_dir):
        raise FileNotFoundError(f"no stats parts under {parts_dir}")
    parts = spark.read.parquet(parts_dir)
    aggs = [F.sum("n_rows").cast("long").alias("n_rows")]
    for c in columns:
        aggs.append(F.sum(f"__nulls_{c}").cast("long").alias(f"__nulls_{c}"))
        # an all-NULL column (or an empty batch) yields NULL sketches;
        # the union of nothing is NULL and its estimate must read as 0
        # distinct values, not crash the fold
        aggs.append(
            F.coalesce(
                F.hll_sketch_estimate(F.hll_union_agg(f"__hll_{c}")),
                F.lit(0),
            )
            .cast("long")
            .alias(f"__ndv_{c}")
        )
    row = parts.agg(*aggs).head()
    out = []
    for c in columns:
        n, nulls = int(row["n_rows"]), int(row[f"__nulls_{c}"])
        out.append(
            {
                "column": c,
                "dtype": None,
                "n_rows": n,
                "n_nulls": nulls,
                "null_frac": (nulls / n) if n else 0.0,
                "ndv_approx": int(row[f"__ndv_{c}"]),
                "min_str": None,
                "max_str": None,
                "max_len": None,
            }
        )
    return out
