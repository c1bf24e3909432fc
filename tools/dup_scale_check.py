#!/usr/bin/env python
"""Dedup-family scale points on the HONEST-duplicate fixture
(VERDICT r12 "Next round" #3).

tools/scale_check.py's shifted-key replication gives every document K−1
exact replicas, so pair-expanding vehicles grow ~K² by fixture
construction and their ladder cells measure the fixture. This runner
times the dedup family on tools/gen_dup_fixture.py corpora instead —
unique content + a fixed ~4.7% small-cluster duplicate rate, so the
duplicate-pair space grows LINEARLY in K and the measured ratios are the
operators' own.

Entries:
- ``dedup_survivors`` / ``dedup_semantic`` / ``dedup_signatures``: the
  catalog vehicles as shipped.
- ``nd_deg_scaled``: cosine near-dup degree (the sim_cosine_topk rider's
  pipeline) with OCCUPANCY-SCALED blocking — block_dims = 6 + ⌈log2 K⌉,
  the "cells grow with n" discipline every blocked operator needs at
  scale. At d=64 random background cosines have σ≈1/√64, so fixed
  6-dim blocking would quadratically re-measure the background tail
  (P(cos≥0.4)≈7e-4 per in-block pair), not the duplicate structure.
- ``comp_collected`` / ``comp_distributed``: duplicate_components over
  the verified near-dup pair graph, both arms of the r13 adaptive size
  guard (cap default vs cap=0) — the cap-threshold behavior check at
  scale. The pair graph is built and checkpointed ONCE per K, so the two
  arms time the labeling alone.

Usage:
    python tools/dup_scale_check.py 30 100 [--only=a,b] [--runs=2]
    # K=1 is always included as the base point; fixtures are generated
    # into /tmp/spark_graft_dup/k{K} when missing and left for reuse.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools.gen_dup_fixture import build_dup_corpus

ROOT = "/tmp/spark_graft_dup"


def _nd_deg_scaled(spark, sf_dir, k):
    from vmware_sd_wan_velocloud_bi_intake_spark.operators import similarity
    from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    bd = 6 + math.ceil(math.log2(k)) if k > 1 else 6
    pairs = similarity.cosine_neardup_pairs(emb, threshold=0.4, block_dims=bd)
    return (
        pairs.select(F.col("vec_a").alias("query_id"))
        .unionByName(pairs.select(F.col("vec_b").alias("query_id")))
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias("nd_degree"))
    )


def _near_pairs(spark, sf_dir):
    from vmware_sd_wan_velocloud_bi_intake_spark.operators import dedup
    from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return dedup.near_dup_pairs(
        docs, "doc_id", "text", threshold=0.4, num_hashes=4, bands=2,
        shingle_n=3,
    ).localCheckpoint(eager=True)


def main() -> None:
    ks = [int(a) for a in sys.argv[1:] if a.isdigit()]
    only = None
    runs = 2
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
    ks = [1] + [k for k in ks if k != 1]

    from bench import _sentinel_once
    from vmware_sd_wan_velocloud_bi_intake_spark.operators import dedup
    from vmware_sd_wan_velocloud_bi_intake_spark.queries import all_queries
    from vmware_sd_wan_velocloud_bi_intake_spark.session import get_spark

    spark = get_spark(app_name="dup-scale-check")
    cat = all_queries()
    results: dict[int, dict[str, float]] = {}
    sentinels: dict[int, float] = {}

    for k in ks:
        sf = os.path.join(ROOT, f"k{k}")
        if not os.path.isdir(os.path.join(sf, "documents.parquet")):
            build_dup_corpus(spark, k, sf)
        timings: dict[str, float] = {}
        names = only or [
            "dedup_signatures",
            "dedup_survivors",
            "dedup_semantic",
            "nd_deg_scaled",
            "comp_collected",
            "comp_distributed",
        ]
        sentinels[k] = _sentinel_once(spark)
        # the component arms share one checkpointed pair graph per K
        near = (
            _near_pairs(spark, sf)
            if {"comp_collected", "comp_distributed"} & set(names)
            else None
        )
        for name in names:
            for _ in range(runs):
                t0 = time.perf_counter()
                if name == "nd_deg_scaled":
                    df = _nd_deg_scaled(spark, sf, k)
                elif name == "comp_collected":
                    df = dedup.duplicate_components(near)
                elif name == "comp_distributed":
                    df = dedup.duplicate_components(near, small_graph_cap=0)
                else:
                    df = cat[name].fn(spark, sf)
                df.write.format("noop").mode("overwrite").save()
                el = time.perf_counter() - t0
                timings[name] = min(timings.get(name, el), el)
            print(f"  k={k} {name}: {timings[name]:.2f}s", flush=True)
        results[k] = timings

    base = results[ks[0]]
    hdr = "".join(f" {f'{k}x':>9s}" for k in ks)
    print(f"\n{'query':20s}{hdr}  sentinels={sentinels}")
    for name in base:
        row = "".join(f" {results[k].get(name, float('nan')):9.2f}" for k in ks)
        ratios = " ".join(
            f"{results[k][name] / base[name]:.2f}x@{k}"
            for k in ks[1:]
            if name in results[k] and base[name]
        )
        print(f"{name:20s}{row}  [{ratios}]")
    spark.stop()


if __name__ == "__main__":
    main()
