#!/usr/bin/env python
"""Interleaved A/B: sim_ann_ivf's PQ rider fold — STAGED single Arrow
pass (shipped) vs the r12 TWO-PASS lazy form (codes and LUTs as two
separate expressions, no checkpoint) — at 1× (sf0.1) and K× (the honest
-duplicate fixture from tools/gen_dup_fixture.py).

VERDICT r13 "Next round" #6: the staged trade must prove itself at the
scale fixture from a clean-window run, or be size-guarded. This runner
makes the comparison reproducible: per pass, one sentinel probe then
each arm once (a host burst hits both arms equally), min-of-N.

    python tools/ab_pq_staging.py [K ...] [--runs=N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BASE = "/root/testdata/sf0.1"
DUP_ROOT = "/tmp/spark_graft_dup"


def _arms(spark, sf_dir):
    """(staged_fn, twopass_fn) — both produce the IDENTICAL result
    relation; only the rider-fold physical shape differs."""
    from vmware_sd_wan_velocloud_bi_intake_spark.operators import pq, similarity
    from vmware_sd_wan_velocloud_bi_intake_spark.queries import textvec
    from vmware_sd_wan_velocloud_bi_intake_spark.queries.textvec import (
        _PQ_M,
        _PQ_RD,
        _trained_centroids,
        _trained_pq_books,
    )
    from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table

    def staged(spark_, sf_):
        return textvec.sim_ann_ivf(spark_, sf_)

    def twopass(spark_, sf_):
        emb = load_table(spark_, sf_, "embeddings", spread=True)
        out = similarity.ann_ivf_topk_trained(
            emb, n_cells=None, k=3, train_iters=4, round_decimals=6,
            cents=_trained_centroids(spark_, sf_, emb),
        )
        books = _trained_pq_books(spark_, sf_, emb)
        base = emb.select(
            F.col("vec_id").alias("_pid"),
            similarity.as_double_array(F.col("embedding")).alias("_pv"),
        )
        nbr = base.select(
            F.col("_pid").alias("_nid"),
            pq.pq_encode_expr("_pv", books, round_decimals=_PQ_RD).alias(
                "_ncodes"
            ),
        )
        qry = base.select(
            F.col("_pid").alias("_qid"),
            pq.pq_lut_expr("_pv", books).alias("_qlut"),
        )
        return (
            out.join(nbr, out["neighbor_id"] == nbr["_nid"])
            .join(qry, out["query_id"] == qry["_qid"])
            .select(
                "query_id",
                "neighbor_id",
                F.round(F.col("cos_sim"), 6).alias("cos_sim_r6"),
                "rk",
                F.concat_ws("-", F.col("_ncodes").cast("array<string>")).alias(
                    "nbr_pq_codes"
                ),
                F.round(
                    pq.pq_score_expr("_ncodes", "_qlut", _PQ_M), _PQ_RD
                ).alias("adc_cos_r6"),
            )
        )

    return staged, twopass


def main() -> None:
    runs = 5
    ks = []
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        else:
            ks.append(int(a))

    from bench import _sentinel_once
    from vmware_sd_wan_velocloud_bi_intake_spark.session import get_spark

    spark = get_spark(app_name="ab_pq_staging")

    dirs = [("1x", BASE)]
    for k in ks:
        d = os.path.join(DUP_ROOT, f"k{k}")
        if not os.path.isdir(d):
            from tools.gen_dup_fixture import build_dup_corpus

            build_dup_corpus(spark, k, d)
        dirs.append((f"{k}x", d))

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for tag, sf in dirs:
        staged, twopass = _arms(spark, sf)
        # warm: trains centroids/books once per sf_dir (the build-once
        # index artifact both arms share), warms footers + workers
        noop(staged(spark, sf))
        noop(twopass(spark, sf))
        sents, s_t, t_t = [], [], []
        for _ in range(runs):
            sents.append(_sentinel_once(spark))
            t0 = time.perf_counter()
            noop(staged(spark, sf))
            s_t.append(round(time.perf_counter() - t0, 3))
            t0 = time.perf_counter()
            noop(twopass(spark, sf))
            t_t.append(round(time.perf_counter() - t0, 3))
        print(
            f"{tag}: staged min={min(s_t)} all={s_t} | "
            f"two-pass min={min(t_t)} all={t_t} | sentinels={sents}"
        )


if __name__ == "__main__":
    main()
