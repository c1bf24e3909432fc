"""Bucketed table layout for shuffle-free co-located joins.

The reference re-probes MySQL per entity every run (``fun_mysql_query.py``),
so every "join" pays a round-trip per row. At 100 TB the analog mistake is
re-shuffling two big fact tables on every join. Bucketing is the standing
fix: write both sides pre-hashed into the same number of buckets on the
join key, and every subsequent join/aggregation on that key is
exchange-free — the shuffle is paid once at write time, amortized over
every downstream read.

Spark bucketing requires the table catalog (bucket metadata lives there),
so these helpers wrap ``saveAsTable`` with an explicit ``path`` option —
data stays in the caller's directory, the metastore only records layout.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) on ``bucket_cols``.

    Sorting within buckets additionally removes the Sort from downstream
    sort-merge joins — two tables written with the same (cols, n_buckets)
    join with neither Exchange nor Sort.
    """
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the catalog)."""
    return spark.table(table)


def write_lsh_index(
    band_rows: DataFrame,
    table: str,
    path: str,
    n_buckets: int = 32,
) -> None:
    """Persist an LSH dedup index WITH its membership summary.

    Writes two tables: ``table`` — the (doc_id, sh, bucket) band rows,
    hash-bucketed on ``bucket`` so incremental batch joins are
    exchange-free on the corpus side — and ``table + "_summary"`` — the
    (bucket, n_members) :func:`~..operators.dedup.bucket_summary` the
    degenerate-bucket cap reads instead of re-aggregating the index
    (operators.dedup.near_dup_pairs_incremental's ``corpus_summary``).
    Counts are associative, so an appending writer maintains the summary by
    adding its own batch's per-bucket counts; this overwrite form
    recomputes both in full.
    """
    from ..operators.dedup import bucket_summary

    write_bucketed(band_rows, table, path, ["bucket"], n_buckets)
    (
        bucket_summary(band_rows.sparkSession.table(table))
        .write.format("parquet")
        .mode("overwrite")
        .option("path", path.rstrip("/") + "_summary")
        .saveAsTable(table + "_summary")
    )
