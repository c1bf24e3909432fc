"""Row-level MERGE sink over parquet (SURVEY.md §2.1 S9/S11 completion).

The reference's richest write pattern is per-row ``INSERT … ON DUPLICATE KEY
UPDATE`` with column subsets and conditional updates
(``fun_mysql_inserts.py:16-374``: some sinks update every column, some only a
"blind" subset like update-timestamp/score columns, and deletes happen out of
band). ``upsert_parquet`` covers the whole-row-replace case; this module is
the full ANSI ``MERGE INTO`` clause set so a reference user has nothing left
to translate by hand:

- ``WHEN MATCHED [AND cond] THEN UPDATE SET <subset|*>``
- ``WHEN MATCHED [AND cond] THEN DELETE``
- ``WHEN NOT MATCHED [AND cond] THEN INSERT``
- ``WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE``

Execution shape: ONE full-outer shuffle join of target and (PK-deduped)
source on the merge keys, then a per-row clause CASE — no driver loops, no
per-row statements. On a warehouse stack the same clause spec compiles to
Delta/Iceberg ``MERGE INTO``; here the result lands via atomic staging swap
(unpartitioned) or dynamic partition overwrite (partitioned), so only the
partitions the batch touches are rewritten.

Scale notes (100 TB):
- The join shuffles on the PK — the same key the table should be bucketed
  on, so with a bucketed target the exchange disappears (see
  ``sinks/bucketed.py``).
- With ``partition_by``, the target side is read with a partition-pruning
  filter derived from the batch's partition values: a 1-partition batch
  against a 10k-partition table reads and rewrites 1 partition, not 10k.
  ``not_matched_by_source_delete`` inspects rows the batch does NOT touch
  and therefore forces a full-table read — it is rejected when combined
  with pruning rather than silently scanning everything.
  PRUNING CONTRACT: the partition value of a given merge key must be
  immutable (partition column functionally dependent on the key — e.g.
  ``month`` derived from an insert-time field, never an updatable one).
  If a key "moves" partitions between target and batch, the old row lives
  in a partition the pruning never reads, so the merge inserts the new
  row WITHOUT removing the old one — a duplicate key. That is the same
  contract every partition-pruned upsert (Hive dynamic overwrite,
  Delta ``replaceWhere``) imposes; for mutable partition values use
  ``partition_by=None`` (full-table merge).
- Clause conditions are Column expressions evaluated post-join — Catalyst
  pushes what it can; the survivor projection is whole-stage-codegen'd.
"""

from __future__ import annotations

import os
from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .upsert import _atomic_overwrite, _dedup_by_keys

_SRC = "__merge_src_present"
_TGT = "__merge_tgt_present"


def _as_cond(cond: Column | bool | None) -> Column:
    if cond is None or cond is True:
        return F.lit(True)
    if cond is False:
        return F.lit(False)
    return cond


def merge_parquet(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    keys: Sequence[str],
    *,
    matched_update: Mapping[str, Column] | bool = True,
    matched_update_condition: Column | None = None,
    matched_delete_condition: Column | bool = False,
    not_matched_insert: bool = True,
    not_matched_insert_condition: Column | None = None,
    not_matched_by_source_delete_condition: Column | bool = False,
    partition_by: str | None = None,
) -> None:
    """MERGE ``source`` into the parquet table at ``path`` on ``keys``.

    Clause semantics follow ANSI MERGE evaluation order per target row:
    matched rows first test DELETE, then UPDATE (else keep the target row);
    source-only rows test INSERT; target-only rows test NOT-MATCHED-BY-SOURCE
    DELETE (else kept). ``matched_update`` is ``True`` (replace every
    non-key column from the source), ``False`` (never update), or a mapping
    ``{col: Column-over-src./tgt.-prefixed-inputs}`` for column-subset /
    computed updates — inside those expressions reference the source's
    value as ``F.col("src.<c>")`` and the target's as ``F.col("tgt.<c>")``.

    Conditions are Columns over the same ``src.``/``tgt.`` namespaces.
    Source rows are PK-deduped first (deterministic survivor, same rule as
    ``upsert_parquet``), mirroring MERGE's one-source-row-per-target-row
    requirement instead of erroring.
    """
    keys = list(keys)
    batch = _dedup_by_keys(source, keys)
    cols = batch.columns
    nmbs = not_matched_by_source_delete_condition
    nmbs_requested = not (nmbs is False or nmbs is None)

    if not os.path.exists(path):
        # no target: every batch row is source-only; insert conditions may
        # only reference src.-columns here (tgt.* is meaningless)
        ins = _as_cond(not_matched_insert_condition) if not_matched_insert else F.lit(False)
        out = batch.alias("src").filter(ins).select(*cols)
        _write(out, path, partition_by, prune_to=None)
        return

    # heal any drop manifest a crashed previous merge left behind BEFORE
    # reading the target, or its stale "deleted" partitions feed this merge
    _recover_pending_drops(path)
    target = spark.read.parquet(path)
    if set(target.columns) != set(cols):
        raise ValueError(
            f"merge schema mismatch: target {sorted(target.columns)} "
            f"vs source {sorted(cols)}"
        )
    prune_to: list | None = None
    if partition_by is not None:
        if nmbs_requested:
            # NMBS-delete must see rows the batch does NOT touch; pruning
            # would silently skip them. Force the caller to choose.
            raise ValueError(
                "not_matched_by_source_delete cannot be combined with "
                "partition pruning (partition_by): untouched partitions "
                "would never be scanned. Pass partition_by=None for a "
                "full-table merge."
            )
        prune_to = [
            r[0] for r in batch.select(partition_by).distinct().collect()
        ]
        # isin() never matches NULL (SQL IN semantics) — a batch touching
        # the null partition must pull the target's null partition too, or
        # the dynamic overwrite would rewrite it from the batch alone and
        # destroy its existing rows
        non_null = [v for v in prune_to if v is not None]
        prune_filter = F.col(partition_by).isin(non_null)
        if len(non_null) < len(prune_to):
            prune_filter = prune_filter | F.col(partition_by).isNull()
        target = target.filter(prune_filter)

    src = batch.alias("src")
    tgt = target.alias("tgt")
    joined = tgt.withColumn(_TGT, F.lit(True)).join(
        src.withColumn(_SRC, F.lit(True)),
        on=[F.col(f"tgt.{k}").eqNullSafe(F.col(f"src.{k}")) for k in keys],
        how="full_outer",
    )
    src_present = F.col(_SRC).isNotNull()
    tgt_present = F.col(_TGT).isNotNull()

    # ANSI MERGE: a clause fires only when its condition is TRUE — a NULL
    # condition (e.g. a predicate over a NULL column) must behave like
    # FALSE. Without the coalesce, ~NULL is NULL, filter() drops the row,
    # and a NULL delete-condition would DELETE instead of keep.
    def fired(cond: Column) -> Column:
        return F.coalesce(cond, F.lit(False))

    upd_cond = (
        fired(_as_cond(matched_update_condition))
        if matched_update is not False
        else F.lit(False)
    )
    del_cond = fired(_as_cond(matched_delete_condition))
    ins_cond = (
        fired(_as_cond(not_matched_insert_condition))
        if not_matched_insert
        else F.lit(False)
    )
    nmbs_cond = fired(_as_cond(nmbs))

    keep = F.when(
        src_present & tgt_present,
        ~del_cond,  # matched: DELETE clause first, else row survives
    ).when(
        src_present,  # source-only
        ins_cond,
    ).otherwise(  # target-only
        ~nmbs_cond
    )

    def value_of(c: str) -> Column:
        src_c, tgt_c = F.col(f"src.{c}"), F.col(f"tgt.{c}")
        if c in keys:
            return F.coalesce(tgt_c, src_c)
        if matched_update is False:
            updated = tgt_c
        elif matched_update is True:
            updated = src_c
        else:
            updated = matched_update.get(c, tgt_c)
        return (
            F.when(src_present & tgt_present & upd_cond, updated)
            .when(src_present & tgt_present, tgt_c)
            .when(src_present, src_c)
            .otherwise(tgt_c)
        )

    out = joined.filter(keep).select(*[value_of(c).alias(c) for c in cols])
    if partition_by is None:
        _write(out, path, partition_by, prune_to=None)
        return
    # Dynamic partition overwrite only replaces partitions PRESENT in the
    # written frame: a pruned partition whose every row was deleted would
    # produce no files — and keep its stale directory, silently
    # resurrecting the "deleted" rows. Materialize the merge result once,
    # find which pruned partitions survived, and drop the emptied ones'
    # directories after the write.
    #
    # persist() here is LOAD-BEARING for correctness, not a cache hint: the
    # dynamic overwrite reads `out`'s lineage FROM `path` while replacing
    # files AT `path`, and only the CacheManager substitution of the
    # materialized rows keeps the write from recomputing against the very
    # files it is deleting (Spark's self-overwrite guard aside). Removing or
    # reordering it breaks the partitioned merge — tests/test_merge_sink.py
    # exercises this path end-to-end.
    #
    # The emptied-partition drop cannot ride the overwrite commit on a plain
    # filesystem, so it is made crash-recoverable instead of atomic: a
    # tombstone manifest (_pending_partition_drops.json, underscore-prefixed
    # so Spark's file index ignores it) lands via atomic rename BEFORE the
    # overwrite and is cleared after the drops. A crash inside the window
    # leaves the manifest, and the next merge over this table heals it
    # before reading (partition-granular recovery — the same granularity at
    # which dynamic overwrite itself can partially fail). Readers between a
    # crash and the next merge can observe the stale partition; callers who
    # need read-time healing call recover_pending_drops(path) first.
    out = out.persist()
    try:
        present = {
            r[0] for r in out.select(partition_by).distinct().collect()
        }
        emptied = [v for v in prune_to if v not in present]
        if emptied:
            _stage_drop_manifest(path, partition_by, emptied)
        _write(out, path, partition_by, prune_to=prune_to)
    finally:
        out.unpersist()
    if emptied:
        _drop_partition_dirs(path, partition_by, emptied)
        _clear_drop_manifest(path)


_DROP_MANIFEST = "_pending_partition_drops.json"


def _stage_drop_manifest(path: str, partition_by: str, values: list) -> None:
    """Atomically (tmp + rename) record the partition values whose
    directories must be dropped once the overwrite lands. NULL round-trips
    as JSON null; other values round-trip through their str() form, which
    is also what ``_drop_partition_dirs`` compares against."""
    import json

    manifest = os.path.join(path, _DROP_MANIFEST)
    tmp = manifest + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "partition_by": partition_by,
                "values": [None if v is None else str(v) for v in values],
            },
            f,
        )
    os.replace(tmp, manifest)


def _clear_drop_manifest(path: str) -> None:
    try:
        os.remove(os.path.join(path, _DROP_MANIFEST))
    except FileNotFoundError:
        pass


def _recover_pending_drops(path: str) -> None:
    """Apply (then clear) a drop manifest left by a merge that crashed
    between staging the manifest and removing the emptied partition
    directories. Dropping is idempotent and correct even if the crash
    happened BEFORE the overwrite: a manifested partition is one whose
    every row the merge deleted, so removing it applies that partition's
    slice of the merge — the same per-partition granularity at which the
    dynamic overwrite itself commits."""
    import json

    manifest = os.path.join(path, _DROP_MANIFEST)
    if not os.path.exists(manifest):
        return
    with open(manifest) as f:
        spec = json.load(f)
    _drop_partition_dirs(path, spec["partition_by"], spec["values"])
    _clear_drop_manifest(path)


def recover_pending_drops(path: str) -> None:
    """Public read-time healer: call before reading a merge-maintained
    partitioned table if a writer may have crashed mid-merge."""
    if os.path.exists(path):
        _recover_pending_drops(path)


def _drop_partition_dirs(path: str, partition_by: str, values: list) -> None:
    """Remove the partition directories for ``values`` (local-FS layout;
    a cluster deployment swaps this for the Hadoop FileSystem API call).

    Directory names are matched by DECODING the on-disk names (Spark
    escapes special chars to %XX, ``__HIVE_DEFAULT_PARTITION__`` encodes
    NULL) rather than re-implementing the escaper — decoding is the
    unambiguous direction.
    """
    import shutil
    from urllib.parse import unquote

    wanted = {("\0NULL" if v is None else str(v)) for v in values}
    prefix = f"{partition_by}="
    for entry in os.listdir(path):
        if not entry.startswith(prefix):
            continue
        raw = entry[len(prefix):]
        decoded = "\0NULL" if raw == "__HIVE_DEFAULT_PARTITION__" else unquote(raw)
        if decoded in wanted:
            shutil.rmtree(os.path.join(path, entry), ignore_errors=True)


def _write(
    df: DataFrame, path: str, partition_by: str | None, *, prune_to: list | None
) -> None:
    if partition_by is None:
        spark = df.sparkSession
        _atomic_overwrite(spark, df, path)
        return
    # Dynamic partition overwrite: only partitions present in `df` are
    # replaced; untouched partition directories are left as-is. `df` was
    # pruned to the batch's partitions, so this rewrites exactly those.
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_by)
        .parquet(path)
    )
