#!/usr/bin/env python
"""64x streaming-ingest scale check (VERDICT r9 "Next round" #4).

Replicates the sf0.1 text/vector fixtures K=64x (shifted ids — the
scale_check.py layout), then drives the TWO streaming index-maintenance
ingests over the replicated corpus as a sequence of monotone-id
micro-batches with the auto-compaction cadence ACTIVE, recording per
batch: wall seconds, and the partition/part counts every read pays a
listing for (index parts, survivors parts, summary parts / members
parts, drift parts).

What flat-ish per-batch wall + bounded part counts demonstrate: the
per-batch cost model is O(batch x index-probe), not O(corpus); and
compaction keeps the LISTING cost of a long-lived stream bounded (the
part count saw-tooths at the compaction boundary instead of growing
linearly with batches).

Usage: python tools/stream_scale_check.py [K] [n_batches] [scratch_dir]
Prints one table per ingest; results are recorded in SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.session import get_spark
from tools.scale_check import OFFSET, build_scaled

COMPACT_EVERY = 4


def _parts(d: str) -> int:
    if not os.path.isdir(d):
        return 0
    return sum(1 for x in os.listdir(d) if x.startswith("_batch_id="))


def run_neardup(spark, sf_dir: str, n_batches: int, scratch: str):
    from vmware_sd_wan_velocloud_bi_intake_spark.streaming.neardup import (
        make_near_dup_ingest,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    # key-shifted replicas carry IDENTICAL text — every post-first batch
    # would be 100% duplicate (probe-only; parts never grow). Salt each
    # replica's shingles by inserting a replica token between words so
    # replicas are mutually NOVEL: each batch then both probes the grown
    # index AND appends, which is the part-count curve compaction exists
    # to bound. (In-replica near-dup structure is preserved — all docs of
    # a replica get the same token.)
    rep = F.floor(F.col("doc_id") / F.lit(OFFSET)).cast("long")
    docs = docs.withColumn(
        "text",
        F.regexp_replace(
            F.col("text"),
            F.lit(r"\s+"),
            F.concat(F.lit(" x"), rep.cast("string"), F.lit(" ")),
        ),
    )
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    step = (hi - lo + n_batches) // n_batches
    idx = os.path.join(scratch, "nd_idx")
    surv = os.path.join(scratch, "nd_surv")
    ingest = make_near_dup_ingest(
        idx,
        surv,
        threshold=0.4,
        num_hashes=4,
        bands=2,
        shingle_n=3,
        compact_summary_every=COMPACT_EVERY,
    )
    print(f"\nnear-dup ingest: {n_batches} batches, compact_every={COMPACT_EVERY}")
    print(f"{'batch':>5s} {'wall_s':>7s} {'idx_parts':>9s} {'surv_parts':>10s} {'summary_parts':>13s}")
    rows = []
    for b in range(n_batches):
        batch = docs.where(
            (F.col("doc_id") >= lo + b * step) & (F.col("doc_id") < lo + (b + 1) * step)
        )
        t0 = time.perf_counter()
        ingest(batch, b)
        w = time.perf_counter() - t0
        r = (b, w, _parts(idx), _parts(surv), _parts(idx + "_summary_parts"))
        rows.append(r)
        print(f"{r[0]:5d} {r[1]:7.2f} {r[2]:9d} {r[3]:10d} {r[4]:13d}")
    return rows


def run_semdedup(spark, sf_dir: str, n_batches: int, scratch: str):
    from vmware_sd_wan_velocloud_bi_intake_spark.streaming.semdedup import (
        make_semantic_dedup_ingest,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    # identical replica vectors would make every post-first batch 100%
    # semantic-duplicate (probe-only). Rotate each replica's vector by
    # its replica index — norm-preserving, and rotations of random
    # vectors are near-orthogonal, so replicas are mutually novel and
    # the members/survivors part curve exercises compaction. Keep the
    # fixture's array<float> element type through the slice/concat
    # (mixed float/double partitions break later reads).
    dim = 64
    rep = (F.floor(F.col("vec_id") / F.lit(OFFSET)) % dim).cast("int")
    emb = emb.withColumn(
        "embedding",
        F.when(rep == 0, F.col("embedding")).otherwise(
            F.concat(
                F.slice(F.col("embedding"), rep + 1, F.lit(dim) - rep),
                F.slice(F.col("embedding"), 1, rep),
            )
        ).cast("array<float>"),
    )
    lo, hi = emb.agg(F.min("vec_id"), F.max("vec_id")).first()
    step = (hi - lo + n_batches) // n_batches
    idx = os.path.join(scratch, "sd_idx")
    surv = os.path.join(scratch, "sd_surv")
    ingest = make_semantic_dedup_ingest(
        idx, surv, threshold=0.4, compact_every=COMPACT_EVERY
    )
    print(f"\nsemantic-dedup ingest: {n_batches} batches, compact_every={COMPACT_EVERY}")
    print(f"{'batch':>5s} {'wall_s':>7s} {'members_parts':>13s} {'surv_parts':>10s} {'drift_parts':>11s}")
    rows = []
    for b in range(n_batches):
        batch = emb.where(
            (F.col("vec_id") >= lo + b * step) & (F.col("vec_id") < lo + (b + 1) * step)
        )
        t0 = time.perf_counter()
        ingest(batch, b)
        w = time.perf_counter() - t0
        r = (
            b,
            w,
            _parts(os.path.join(idx, "members")),
            _parts(surv),
            _parts(os.path.join(idx, "drift_parts")),
        )
        rows.append(r)
        print(f"{r[0]:5d} {r[1]:7.2f} {r[2]:13d} {r[3]:10d} {r[4]:11d}")
    return rows


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    k = int(args[0]) if args else 64
    n_batches = int(args[1]) if len(args) > 1 else 16
    scratch = args[2] if len(args) > 2 else "/tmp/spark_graft_stream_scale"
    out_dir = os.path.join(scratch, f"x{k}")
    spark = get_spark(app_name="stream-scale-check")
    build_scaled(spark, k, out_dir, ["documents", "embeddings"])
    run_neardup(spark, out_dir, n_batches, scratch)
    run_semdedup(spark, out_dir, n_batches, scratch)
    shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
