#!/usr/bin/env python
"""Honest-duplicate scale fixture (VERDICT r12 "Next round" #3).

The scale ladder's shifted-key replication (tools/scale_check.py) is the
right instrument for scan/join/agg families, but it is the WRONG corpus
for pair-expanding operators: at K× every document gains K−1 exact
replicas, so the duplicate-pair space grows ~K² *by fixture construction*
and a ladder point over it re-measures the fixture, not the operator
(SCALE.md 100× section documents the gap).

This generator builds `documents` + `embeddings` tables of ANY size with
a real corpus's duplicate structure instead: unique content per document
plus a controlled, seeded duplicate rate in small clusters —

- docs are grouped in blocks of 64 ids; in every block, offsets 1 and 2
  are NEAR-duplicates of the block's seed (offset 0): same word sequence
  with one word substituted (3-gram Jaccard ≈ 0.5–0.9 depending on
  length, straddling the 0.4 verify threshold exactly like organic
  near-dups — some candidates verify, some miss, LSH at the catalog
  knobs catches a fraction: the honest workload);
- offset 3 is an EXACT duplicate of the seed in every second block;
- everything else is unique text keyed by its own id.

→ ~4.7% of documents sit in duplicate clusters of size 3–4, ~1.6% rows
are exact dups — the 2–5% small-cluster regime of real web corpora
(CCNet/RefinedWeb-style), and crucially the cluster size is O(1) in K, so
the pair space grows LINEARLY with the corpus.

Embeddings mirror the same block structure: unique vectors are uniform
hash noise in [-1, 1]^64 (pairwise cosine concentrates near 0, far below
every τ), near members are the seed vector + small per-member noise
(cosine ≈ 0.99 — above τ unless a low-magnitude sign dim flips its
block), exact members copy the seed.

Everything is a pure expression of xxhash64 over (content_key, position)
— fully deterministic, no Python RNG, no driver-side rows; generation is
one Spark job per table at any K.

Usage:
    python tools/gen_dup_fixture.py K OUT_DIR
    # K=1 → 5,000 docs (the sf0.1 size); K=100 → 500,000
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BASE_DOCS = 5_000  # sf0.1 documents row count: K is "× sf0.1"
BLOCK = 64
VOCAB_SIZE = 512
DIM = 64


def _h(*cols):
    return F.xxhash64(*cols)


def _pm(col, n: int):
    return F.pmod(col, F.lit(n))


def build_dup_corpus(spark, k: int, out_dir: str) -> None:
    n = BASE_DOCS * k
    os.makedirs(out_dir, exist_ok=True)
    vocab = F.array(*[F.lit(f"tok{i:03d}") for i in range(VOCAB_SIZE)])

    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    off = _pm(F.col("doc_id"), BLOCK)
    grp = (F.col("doc_id") / BLOCK).cast("long")
    seed_id = grp * BLOCK
    is_near = off.isin(1, 2)
    is_exact = (off == 3) & (_pm(grp, 2) == 0)
    # content key: dup members draw their words from the SEED's stream
    cid = F.when(is_near | is_exact, seed_id).otherwise(F.col("doc_id"))

    base = ids.select(
        "doc_id",
        cid.alias("cid"),
        is_near.alias("is_near"),
        off.alias("off"),
    )
    length = (F.lit(12) + _pm(_h(F.col("cid"), F.lit(7)), 28)).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), length),
        lambda j: F.element_at(vocab, (_pm(_h(F.col("cid"), j), VOCAB_SIZE) + 1).cast("int")),
    )
    # near members substitute ONE word (position = their block offset) with
    # a word keyed by their OWN id — every other position stays the seed's
    mut = F.element_at(
        vocab, (_pm(_h(F.col("doc_id"), F.lit(-1)), VOCAB_SIZE) + 1).cast("int")
    )
    words = F.when(
        F.col("is_near"),
        F.transform(
            words,
            lambda w, i: F.when(i == F.col("off").cast("int"), mut).otherwise(w),
        ),
    ).otherwise(words)
    text = F.concat_ws(" ", words)
    docs = base.select(
        "doc_id",
        text.alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("es"), F.lit("de"), F.lit("fr")),
            (_pm(_h(F.col("cid"), F.lit(11)), 4) + 1).cast("int"),
        ).alias("lang"),
        F.concat(
            F.lit("src"), _pm(_h(F.col("cid"), F.lit(13)), 4).cast("string")
        ).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))
    n_files = max(1, min(64, 2 * k))
    docs.repartition(n_files).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )

    # embeddings: same block structure over vec_id
    vids = spark.range(n).select(F.col("id").alias("vec_id"))
    voff = _pm(F.col("vec_id"), BLOCK)
    vgrp = (F.col("vec_id") / BLOCK).cast("long")
    vseed = vgrp * BLOCK
    v_near = voff.isin(1, 2)
    v_exact = (voff == 3) & (_pm(vgrp, 2) == 0)
    vcid = F.when(v_near | v_exact, vseed).otherwise(F.col("vec_id"))
    vb = vids.select("vec_id", vcid.alias("cid"), v_near.alias("is_near"))
    # base coordinate in [-1, 1]; member noise ±0.1 only on near members
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (
            (_pm(_h(F.col("cid"), j + 100), 2001) - 1000) / F.lit(1000.0)
            + F.when(
                F.col("is_near"),
                (_pm(_h(F.col("vec_id"), j + 500), 21) - 10) / F.lit(100.0),
            ).otherwise(F.lit(0.0))
        ).cast("float"),
    )
    vb.select(
        "vec_id",
        emb.alias("embedding"),
        _pm(_h(F.col("cid"), F.lit(17)), 8).cast("int").alias("label"),
    ).repartition(n_files).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )


def main() -> None:
    from vmware_sd_wan_velocloud_bi_intake_spark.session import get_spark

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/tmp/spark_graft_dup/k{k}"
    )
    spark = get_spark(app_name="gen-dup-fixture")
    build_dup_corpus(spark, k, out)
    print(f"wrote honest-dup fixture K={k} → {out}")
    spark.stop()


if __name__ == "__main__":
    main()
