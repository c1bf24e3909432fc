"""Streaming semantic dedup ingest — the SemDeDup incremental flow
(operators/similarity.py, Abbas et al. 2023, arXiv:2303.09540) on
Structured Streaming ``foreachBatch``, completing the dedup family's
streaming story: exact (streaming/stateful.py, streaming/tws.py),
near-dup LSH (streaming/neardup.py), and now embedding-semantic.

Per micro-batch: (1) in-batch SemDeDup at the index's FROZEN coarse
quantizer (``semantic_dedup_survivors(cents=...)`` — keep-the-outlier
inside each cell, the paper's rule); (2) the kept rows probe the
persisted IVF members for semantic duplicates of the already-curated
corpus (``semantic_dedup_incremental``: broadcast cell assignment +
one cell equi-join — O(batch × cell size), the corpus is never
re-assigned); (3) novel rows append to the survivors table and their
(cell, vid, v, nrm) member rows grow the index, both keyed by
``_batch_id`` via dynamic partition overwrite. The FIRST batch trains
the quantizer (deterministic: bounded md5-ordered sample + quantized
Lloyd) and becomes the corpus. Replays recompute against the exact
pre-batch state (own-batch exclusion from the members, the
streaming/neardup.py discipline) and rewrite their partitions
byte-identically; the shared guards (streaming/ingestbase.py)
fingerprint the knobs and refuse fresh-checkpoint batch-id collisions.

Scale: state lives in storage, not the state store. Per batch the work
is one broadcast assignment + one cell-keyed join + the in-batch pair
expansion (n²/cells, chunked BLAS kernel) — write the members bucketed
on ``cell`` for an exchange-free corpus side at rest. The quantizer is
frozen after the build batch, so cells drift as topics shift — the same
retrain trade-off ``ivf_pq_append`` documents; monitor with
``operators.pq.occupancy_drift`` over the members relation if the
stream outlives its build distribution.

Layout: ``<index_dir>/centroids`` (once), ``<index_dir>/members``
∂ _batch_id, ``<survivors_dir>`` ∂ _batch_id (original batch columns),
``<index_dir>_knobs.json`` (fingerprint + committed head).
"""

from __future__ import annotations

import math
import os
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import similarity as sim


def make_semantic_dedup_ingest(
    index_dir: str,
    survivors_dir: str,
    *,
    vec_id: str = "vec_id",
    embedding: str = "embedding",
    threshold: float = 0.4,
    n_cells: int | None = None,
    train_iters: int = 4,
    round_decimals: int | None = 6,
    compact_every: int | None = 64,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` body: ``fn(batch_df, batch_id)``.

    ``threshold`` is the SemDeDup cosine: pairs at or above it are
    semantic duplicates (in-batch the member closer to its centroid
    loses; against the corpus the batch row loses — the corpus is
    already curated). The first batch's quantizer becomes the index's
    permanent cell structure, so point the stream at a representative
    slice first. Empty batches are no-ops. Every ``compact_every``
    batches the committed members/survivors partitions fold into the
    base partition by row-preserving concatenation
    (``sinks.compact.compact_rows_parts``) — bounding the per-batch
    partition listing on a long-lived stream; None disables.
    """
    root = index_dir.rstrip("/")
    members_dir = os.path.join(root, "members")
    centroids_dir = os.path.join(root, "centroids")
    knobs_path = root + "_knobs.json"
    knobs = {
        "format": "semdedup-knobs/v1",
        "vec_id": vec_id,
        "embedding": embedding,
        "threshold": threshold,
        "n_cells": n_cells,
        "train_iters": train_iters,
        "round_decimals": round_decimals,
    }

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        from .ingestbase import (
            batch_fingerprint,
            check_knobs,
            check_sequence,
            record_head,
        )

        spark = batch_df.sparkSession
        check_knobs(
            knobs_path,
            "semdedup-knobs/v1",
            knobs,
            mismatch_hint=(
                "cell assignments and survivor decisions from different "
                "(threshold, quantizer, rounding) configurations are not "
                "comparable; rebuild the index or restore the original "
                "configuration"
            ),
        )
        fp = batch_fingerprint(batch_df, vec_id)
        check_sequence(knobs_path, "semdedup-knobs/v1", batch_id, fp)
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            # batches < batch_id are committed (foreachBatch serializes
            # epochs) — never this batch's own partition, so the
            # own-batch replay exclusion below is unaffected
            from ..sinks.compact import compact_rows_parts

            compact_rows_parts(spark, members_dir, batch_id)
            compact_rows_parts(spark, survivors_dir, batch_id)
        if batch_df.select(vec_id).limit(1).isEmpty():
            record_head(knobs_path, "semdedup-knobs/v1", batch_id, fp)
            return
        if not os.path.isdir(centroids_dir):
            # ---- build batch: train the quantizer, become the corpus ---
            cells = n_cells or max(
                8, math.ceil(math.sqrt(batch_df.select(vec_id).count()))
            )
            cents = sim.train_centroids(
                batch_df,
                cells,
                vec_id=vec_id,
                embedding=embedding,
                iters=train_iters,
                round_decimals=round_decimals,
            )
            cents.write.mode("overwrite").parquet(centroids_dir)
        cents = spark.read.parquet(centroids_dir)
        # ---- in-batch SemDeDup at the frozen quantizer ------------------
        kept_ids = sim.semantic_dedup_survivors(
            batch_df,
            threshold=threshold,
            vec_id=vec_id,
            embedding=embedding,
            round_decimals=round_decimals,
            cents=cents,
        ).select(vec_id)
        kept = batch_df.join(kept_ids, vec_id, "left_semi")
        # ---- against the persisted corpus (own batch excluded: a replay
        # recomputes against the exact pre-batch state, else every row
        # would self-match and the batch's partitions would empty out) ----
        novel = kept
        if os.path.isdir(members_dir):
            members = spark.read.parquet(members_dir).where(
                F.col("_batch_id") != F.lit(int(batch_id))
            )
            pairs = sim.semantic_dedup_incremental(
                kept,
                cents,
                members.drop("_batch_id"),
                threshold=threshold,
                vec_id=vec_id,
                embedding=embedding,
                round_decimals=round_decimals,
            )
            losers = pairs.select(F.col("batch_id").alias(vec_id)).distinct()
            novel = kept.join(losers, vec_id, "left_anti")
        # ---- idempotent batch-keyed writes (per-WRITE dynamic overwrite:
        # scoped to each write, never mutates the session conf) -----------
        novel = novel.persist()
        try:
            (
                novel.withColumn("_batch_id", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .parquet(survivors_dir)
            )
            (
                sim.ivf_members(
                    novel,
                    cents,
                    vec_id=vec_id,
                    embedding=embedding,
                    round_decimals=round_decimals,
                )
                .withColumn("_batch_id", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .parquet(members_dir)
            )
            record_head(knobs_path, "semdedup-knobs/v1", batch_id, fp)
        finally:
            novel.unpersist()

    return ingest


def read_semantic_survivors(spark, survivors_dir: str) -> DataFrame:
    """The accumulated semantically-deduped corpus (bookkeeping dropped)."""
    return spark.read.parquet(survivors_dir).drop("_batch_id")
