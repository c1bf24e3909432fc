"""Idempotent key-based sinks (SURVEY.md §2.1 S9–S13).

The reference writes one MySQL statement per value with ``INSERT … ON
DUPLICATE KEY UPDATE`` / ``INSERT IGNORE`` (``fun_mysql_inserts.py:16-374``).
Set-oriented equivalents:

- **upsert**        = new batch wins per PK: anti-join old vs new, union, write
                      (``MERGE WHEN MATCHED UPDATE / NOT MATCHED INSERT``).
- **insert-ignore** = old wins per PK: anti-join new vs old, append survivors.
- **CSV report**    = ``df.write.csv`` (reference S12 ``/tmp/*.csv`` dumps).

Harness storage is parquet (TESTDATA.md); on a warehouse stack the same
functions target Delta ``MERGE INTO`` or a JDBC ``foreachBatch`` upsert — the
batch-building logic (dedup by PK, deterministic survivor choice) is
identical, only the final writer changes.

Scale notes: both operations shuffle once on the PK. Writing is
overwrite-into-staging + atomic swap so a failed job never leaves a
half-written table; re-running the same batch is a no-op by construction
(the reference achieves the same via per-row upsert idempotency).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window


def _dedup_by_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Keep exactly one row per PK, deterministically (greatest non-key tuple).

    ``dropDuplicates`` keeps an arbitrary row under parallelism; a window
    ordered by the remaining columns makes the survivor stable across runs
    and cluster layouts.
    """
    non_keys = [c for c in df.columns if c not in keys]
    if not non_keys:
        return df.dropDuplicates(list(keys))
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc_nulls_last() for c in non_keys])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_parquet(
    spark: SparkSession, df: DataFrame, path: str, keys: Sequence[str]
) -> None:
    """MERGE semantics onto a parquet table: incoming rows win per PK (S9).

    Existing rows whose PK collides with the batch are replaced; everything
    else is kept. Atomic via staging-dir swap.
    """
    batch = _dedup_by_keys(df, keys)
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        kept = existing.join(batch.select(*keys).distinct(), list(keys), "left_anti")
        # join moves key columns first; restore the batch's column order so
        # repeated upserts produce byte-identical table schemas
        merged = kept.unionByName(batch).select(*batch.columns)
    else:
        merged = batch
    _atomic_overwrite(spark, merged, path)


def insert_ignore_parquet(
    spark: SparkSession, df: DataFrame, path: str, keys: Sequence[str]
) -> None:
    """INSERT IGNORE semantics: existing rows win, new PKs appended (S10).

    Mirrors the reference's events sink (unique (Date, EdgeID, Name) +
    INSERT IGNORE, ``fun_mysql_inserts.py:282-288``).
    """
    batch = _dedup_by_keys(df, keys)
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        fresh = batch.join(existing.select(*keys).distinct(), list(keys), "left_anti")
        merged = existing.unionByName(fresh).select(*batch.columns)
    else:
        merged = batch
    _atomic_overwrite(spark, merged, path)


def write_csv_report(df: DataFrame, path: str) -> None:
    """CSV side-output (reference S12, dump_appid_specific_qos_rules)."""
    df.write.mode("overwrite").option("header", "true").csv(path)


def swap_into_place(staging: str, path: str) -> None:
    """Crash-safe directory swap: at every instant a complete copy of the
    data exists on disk.

    rmtree-then-replace has a data-loss window — if the replace (or a
    partial rmtree) fails, the original is gone and the generic cleanup
    that removes the staging dir destroys the only remaining copy. The
    rename protocol never holds fewer than one complete copy: the
    original renames ASIDE (not deleted), staging renames in, and only
    then is the set-aside copy removed; a failure between the renames
    restores the original. Shared by the upsert sinks and compaction.
    """
    old = None
    if os.path.exists(path):
        old = tempfile.mkdtemp(
            prefix=os.path.basename(path) + ".old.",
            dir=os.path.dirname(path) or ".",
        )
        os.rmdir(old)
        os.replace(path, old)
    try:
        os.replace(staging, path)
    except BaseException:
        if old is not None:
            os.replace(old, path)  # restore the original
        raise
    if old is not None:
        shutil.rmtree(old, ignore_errors=True)


def _atomic_overwrite(spark: SparkSession, df: DataFrame, path: str) -> None:
    """Write to a staging dir, then swap — readers never see partial output."""
    staging = tempfile.mkdtemp(
        prefix=os.path.basename(path) + ".staging.", dir=os.path.dirname(path) or "."
    )
    try:
        df.write.mode("overwrite").parquet(staging)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    swap_into_place(staging, path)
