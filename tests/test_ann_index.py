"""Incremental IVF index tests (operators/similarity.py).

The persisted-index query path must reproduce the self-indexing operator
exactly at nprobe=1, and multi-probe may only widen the candidate set.
"""

from __future__ import annotations

import collections

import pytest

from vmware_sd_wan_velocloud_bi_intake_spark.operators.similarity import (
    ann_ivf_query,
    ann_ivf_topk,
    ivf_index,
)
from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_correct):
    df = load_table(spark, sf_correct, "embeddings").limit(600).cache()
    yield df
    df.unpersist()


# slow tier (r14 re-tier, VERDICT r13 #2): self-indexing replication: the annindex stream two-phase SQL replay + pq unit gates keep the index-query class default
@pytest.mark.slow
def test_index_query_matches_self_indexing_at_nprobe_1(spark, emb):
    base = {
        (r["query_id"], r["rk"]): r["neighbor_id"]
        for r in ann_ivf_topk(emb, n_cells=16, k=3).collect()
    }
    cents, members = ivf_index(emb, n_cells=16)
    inc = {
        (r["query_id"], r["rk"]): r["neighbor_id"]
        for r in ann_ivf_query(emb, cents, members, k=3, nprobe=1).collect()
    }
    assert inc == base and len(inc) > 0


def test_multi_probe_widens_never_shrinks(spark, emb):
    cents, members = ivf_index(emb, n_cells=16)
    one = ann_ivf_query(emb, cents, members, k=3, nprobe=1).collect()
    two = ann_ivf_query(emb, cents, members, k=3, nprobe=2).collect()
    n1 = collections.Counter(r["query_id"] for r in one)
    n2 = collections.Counter(r["query_id"] for r in two)
    assert all(n2[q] >= c for q, c in n1.items())
    # and nprobe=2 top-1 cosine is >= nprobe=1 top-1 (recall can only improve)
    top1 = {r["query_id"]: r["cos_sim"] for r in one if r["rk"] == 1}
    top2 = {r["query_id"]: r["cos_sim"] for r in two if r["rk"] == 1}
    assert all(top2[q] >= top1[q] - 1e-12 for q in top1)


def test_query_batch_disjoint_from_corpus(spark, emb):
    corpus = emb.filter("vec_id % 2 = 0")
    batch = emb.filter("vec_id % 2 = 1")
    cents, members = ivf_index(corpus, n_cells=8)
    out = ann_ivf_query(batch, cents, members, k=2, nprobe=1).collect()
    assert len(out) > 0
    corpus_ids = {r["vec_id"] for r in corpus.select("vec_id").collect()}
    batch_ids = {r["vec_id"] for r in batch.select("vec_id").collect()}
    for r in out:
        assert r["query_id"] in batch_ids
        assert r["neighbor_id"] in corpus_ids
