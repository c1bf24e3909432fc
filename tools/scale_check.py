#!/usr/bin/env python
"""Empirical scaling check: replicate the sf0.1 fixtures K× (shifted keys,
multi-row-group parquet — i.e. the file layout a real corpus has) into a
scratch dir, then time representative heavy queries at 1× and K× and print
the scaling ratio per query.

Near-linear ratios (≈K for scan-bound, ≈K·log or mildly super-linear for
pair-expanding operators) are the expected signature; quadratic blow-ups
would expose a pair-space leak. Results recorded in SCALE.md.

Usage: python tools/scale_check.py [K] [scratch_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.queries import all_queries
from vmware_sd_wan_velocloud_bi_intake_spark.session import get_spark

BASE = "/root/testdata/sf0.1"


def _lm_train_score(spark, sf_dir):
    """Full bigram-LM pass: train counts + broadcast scoring."""
    from vmware_sd_wan_velocloud_bi_intake_spark.operators import lm
    from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    model = lm.train_bigram_lm(docs)
    return lm.score_bigram_logprob(docs, model)


def _pq_index_search(spark, sf_dir):
    """IVF-PQ one-shot: train + assign + encode + nprobe-4 refined search.

    NOTE (r13, measured at 100×): this entry's ratio is dominated by the
    BUILD — cell assignment at √n̄ cells is n·√n̄ dots plus the
    full-corpus Arrow encode, none of it amortized (185× at 100× vs the
    search's 29–36×; SCALE.md "PQ path at 100×"). Use the
    `pq_search_persisted` entry below for the deployment-shape number.
    """
    from pyspark.sql import functions as F  # noqa: F811

    from vmware_sd_wan_velocloud_bi_intake_spark.operators import pq, similarity
    from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table

    # single-file fixture → spread for scan parallelism (the documented
    # load_table gate; a real corpus has it naturally)
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    cents, members, books = pq.ivf_pq_index(emb, m=8, ksub=16, train_iters=4)
    fmembers = emb.select(
        F.col("vec_id").alias("vid"),
        similarity.as_double_array(F.col("embedding")).alias("v"),
    ).withColumn("nrm", similarity.l2_norm(F.col("v")))
    return pq.ann_ivf_pq_topk(
        emb, cents, members, books, k=3, nprobe=4, refine=12, members=fmembers
    )


# per-sf_dir IVF-PQ index cache for the persisted-search entry: the first
# (warm-up / run-1) call pays the build once, so min-of-N timing measures
# the SEARCH alone — the deployment shape, where the index is maintained
# incrementally by the streaming ingest and searches amortize the build
_PQ_INDEX_CACHE: dict = {}


def _pq_search_persisted(spark, sf_dir):
    """IVF-PQ search over a PERSISTED index (nprobe=4 + refine-12 rerank).

    The honest scale row for the PQ path's search: 100× measured 26–36×
    (vs 41–50× for exact in-cell and 185× for the one-shot build) — see
    SCALE.md "PQ path at 100×".
    """
    from pyspark.sql import functions as F  # noqa: F811

    from vmware_sd_wan_velocloud_bi_intake_spark.operators import pq, similarity
    from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    if sf_dir not in _PQ_INDEX_CACHE:
        cents, members, books = pq.ivf_pq_index(
            emb, m=8, ksub=16, train_iters=4
        )
        _PQ_INDEX_CACHE[sf_dir] = (
            cents.localCheckpoint(eager=True),
            members.localCheckpoint(eager=True),
            books,
        )
    cents, members, books = _PQ_INDEX_CACHE[sf_dir]
    fmembers = emb.select(
        F.col("vec_id").alias("vid"),
        similarity.as_double_array(F.col("embedding")).alias("v"),
    ).withColumn("nrm", similarity.l2_norm(F.col("v")))
    return pq.ann_ivf_pq_topk(
        emb, cents, members, books, k=3, nprobe=4, refine=12, members=fmembers
    )


# DataFrame-returning extras timed alongside the catalog entries (operators
# without a catalog vehicle; same noop-write timing)
def _bpe_train_encode(spark, sf_dir):
    """BPE: 16-merge training + full-corpus encode."""
    from vmware_sd_wan_velocloud_bi_intake_spark.operators import bpe
    from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe.train_bpe(docs, num_merges=16)
    return bpe.bpe_encode(docs, merges)


def _bpe_train_batched(spark, sf_dir):
    """Batched BPE (r8 scale path): 16 merges at merge_batch=16 — one
    top-K job per round instead of one per merge — + full-corpus encode.
    The interesting number vs bpe_train_encode is the RATIO at Kx: both
    should scale with the corpus word count, but this one's fixed
    scheduler floor is ~B x smaller."""
    from vmware_sd_wan_velocloud_bi_intake_spark.operators import bpe
    from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    # ratio pinned to 0 so the bench semantics (one round, ceil(N/B)
    # jobs) stay fixed across rounds regardless of the trainer's
    # drift-throttle default
    merges = bpe.train_bpe_batched(
        docs, num_merges=16, merge_batch=16, min_count_ratio=0.0
    )
    return bpe.bpe_encode(docs, merges)


def _leakage_fix(spark, sf_dir):
    """Split-leakage refold (r8): id-hash split -> cluster-grain refold.
    Inherits the near-dup pass's bucketed shape + O(log n) component
    rounds; the ratio at Kx should track the near-dup family's."""
    from vmware_sd_wan_velocloud_bi_intake_spark.operators import export
    from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    labeled = export.split_by_hash(docs, "doc_id", {"train": 0.9, "val": 0.1})
    return export.fix_split_leakage(
        labeled, "doc_id", "text", threshold=0.5, num_hashes=8, bands=4,
        shingle_n=3,
    )


def _classifier_train_score(spark, sf_dir):
    """Quality classifier: 8 GD iterations + full-corpus scoring."""
    from vmware_sd_wan_velocloud_bi_intake_spark.operators import classifier
    from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    w, b = classifier.train_quality_classifier(
        docs, positive_sources={"src0", "src1"}, iters=8
    )
    return classifier.score_quality(docs, w, b)


def _span_dedup(spark, sf_dir):
    """ExactSubstr-grain passage removal; replicated fixtures make every
    document a full duplicate of its K−1 replicas, so the marked-span
    volume is the worst case (≈ the whole corpus)."""
    from vmware_sd_wan_velocloud_bi_intake_spark.operators import spans
    from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return spans.remove_duplicate_spans(docs, "doc_id", "text", k=20)


def _curation(spark, sf_dir):
    """The COMPOSED pipeline (plans/curation.py): redact → heuristic gate →
    LM perplexity gate → exact dedup → near dedup → passage pass. Stages
    are measured individually elsewhere in this file; this entry times the
    composition — cache handoffs, stage fusion, and any cross-stage plan
    blow-up only the end-to-end run exposes. Returns the curated frame;
    the timing harness's noop write materializes the whole DAG (cached
    relations released by the caller wrapper below)."""
    from vmware_sd_wan_velocloud_bi_intake_spark.plans.curation import curate_corpus
    from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents", spread=True)
    res = curate_corpus(
        docs,
        max_perplexity=12.0,
        passage_dedup_k=20,
    )

    class _Releasing:
        """Duck-typed write passthrough: release the pipeline's caches
        after the timed noop write so K× runs don't accumulate executor
        cache across timing repetitions."""

        @property
        def write(self):
            w = res.curated.write

            class _W:
                def format(self, *a):
                    self._f = w.format(*a)
                    return self

                def mode(self, *a):
                    self._f = self._f.mode(*a)
                    return self

                def save(self):
                    try:
                        self._f.save()
                    finally:
                        res.release()

            return _W()

    return _Releasing()


CUSTOM = {
    "lm_train_score": _lm_train_score,
    "pq_index_search": _pq_index_search,
    "pq_search_persisted": _pq_search_persisted,
    "bpe_train_encode": _bpe_train_encode,
    "bpe_train_batched": _bpe_train_batched,
    "leakage_fix": _leakage_fix,
    "classifier_train_score": _classifier_train_score,
    "span_dedup": _span_dedup,
    "curation": _curation,
}

QUERIES = [
    "dedup_semantic",
    "dedup_signatures",
    "dedup_survivors",
    "dedup_stream_snapshot",
    "sim_ann_ivf",
    "sim_cosine_topk",
    "a06_customer_rollup",
    "a08_pricing_summary",
    "a19_grouping_rollup",
    "a22_sketch_stats",
    "w02_outage_summary",
    "w07_sessionize",
    "j01_metrics_join",
]

# (table, key columns to shift so replicas don't collide)
SHIFT = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id"],  # user_id kept → per-user series grow K×
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "customer": [],
    "part": [],
    "supplier": [],
    "nation": [],
    "region": [],
}
OFFSET = 100_000_000


def build_scaled(
    spark, k: int, out_dir: str, tables: list[str] | None = None
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for table, keys in SHIFT.items():
        if tables is not None and table not in tables:
            continue
        src = spark.read.parquet(f"{BASE}/{table}.parquet")
        if keys and k > 1:
            parts = []
            for i in range(k):
                rep = src
                for key in keys:
                    rep = rep.withColumn(key, F.col(key) + F.lit(i * OFFSET))
                parts.append(rep)
            scaled = parts[0]
            for p in parts[1:]:
                scaled = scaled.unionByName(p)
        else:
            scaled = src
        # multiple output files → multiple row groups → natural parallelism
        n_files = max(1, min(32, scaled.rdd.getNumPartitions() * (k if keys else 1)))
        scaled.repartition(n_files).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{table}.parquet")
        )


# min-of-N per point; 1 for very long compositions (noise rejection matters
# less when the measured effect is 10x the jitter)
N_RUNS = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "2"))


def time_queries(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    cat = all_queries()
    out = {}
    for name in names:
        fn = CUSTOM[name] if name in CUSTOM else cat[name].fn
        best = None
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        out[name] = best
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    only = [
        a.split("=", 1)[1].split(",")
        for a in sys.argv[1:]
        if a.startswith("--only=")
    ]
    tables = None
    for a in sys.argv[1:]:
        # restrict fixture replication (e.g. --tables=documents,embeddings
        # for a large-K run over the text/vector families only)
        if a.startswith("--tables="):
            tables = a.split("=", 1)[1].split(",")
    names = only[0] if only else QUERIES + list(CUSTOM)
    k = int(args[0]) if args else 8
    scratch = args[1] if len(args) > 1 else "/tmp/spark_graft_scale"
    out_dir = os.path.join(scratch, f"x{k}")
    spark = get_spark(app_name="scale-check")

    build_scaled(spark, k, out_dir, tables)
    base_t = time_queries(spark, BASE, names)
    big_t = time_queries(spark, out_dir, names)
    print(f"\n{'query':28s} {'1x':>8s} {f'{k}x':>8s} {'ratio':>7s}")
    for name in names:
        r = big_t[name] / base_t[name] if base_t[name] else float("nan")
        print(f"{name:28s} {base_t[name]:8.2f} {big_t[name]:8.2f} {r:7.2f}")
    shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
