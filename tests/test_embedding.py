"""Feature-hashing document embeddings (operators/embedding.py): exact
python replay, determinism across partitionings, and the end-to-end
composition that motivates it — text-only semantic dedup through the
vector stack."""

from __future__ import annotations

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.operators import (
    embedding,
    similarity,
)
from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table


def _replay(text: str, dim: int) -> np.ndarray:
    v = np.zeros(dim)
    for tok in re.sub(r"\s+", " ", text.lower()).strip().split(" "):
        if tok:
            b, s = embedding._token_slot(tok, dim)
            v[b] += s
    n = np.linalg.norm(v)
    return (v / max(n, 1e-12)).astype("float32")


def test_matches_python_replay_exactly(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(50)
    got = {
        r["vec_id"]: np.array(r["embedding"], dtype="float32")
        for r in embedding.hashed_doc_embedding(docs, dim=32).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        assert np.array_equal(got[r["doc_id"]], _replay(r["text"], 32))


def test_deterministic_across_partitionings(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(100)
    a = embedding.hashed_doc_embedding(docs.repartition(1), dim=16).collect()
    b = embedding.hashed_doc_embedding(docs.repartition(13), dim=16).collect()
    am = {r["vec_id"]: list(r["embedding"]) for r in a}
    bm = {r["vec_id"]: list(r["embedding"]) for r in b}
    assert am == bm


def test_empty_doc_embeds_as_zero_vector(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "hello world")],
        "doc_id long, text string",
    )
    got = {
        r["vec_id"]: np.array(r["embedding"])
        for r in embedding.hashed_doc_embedding(docs, dim=8).collect()
    }
    assert np.all(got[1] == 0.0) and np.all(got[2] == 0.0)
    assert abs(np.linalg.norm(got[3]) - 1.0) < 1e-6


def test_text_only_semantic_dedup_composes(spark):
    """The motivating pipeline: plant near-duplicate texts, embed with the
    hashing trick, run SemDeDup over the derived vectors — the duplicates
    collapse to one survivor while distinct docs all survive."""
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the morning sun"
    )
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base + " today"),          # near-dup of 0
            (2, base.replace("cat", "kitten")),  # near-dup of 0
            (3, "completely different content about spark shuffles and "
                "partitions and the catalyst optimizer pipeline stages"),
            (4, "numbers one two three four five six seven eight nine "
                "ten eleven twelve thirteen fourteen fifteen sixteen"),
        ],
        "doc_id long, text string",
    )
    emb = embedding.hashed_doc_embedding(docs, dim=64)
    out = similarity.semantic_dedup_survivors(
        emb, threshold=0.9, n_cells=2, train_iters=2
    )
    survivors = {r["vec_id"] for r in out.collect()}
    assert {3, 4} <= survivors
    assert len(survivors & {0, 1, 2}) == 1


def test_null_text_embeds_as_zero_vector(spark):
    """NULL text behaves like empty text (zero vector), not a kernel crash
    (r6 advisor finding)."""
    docs = spark.createDataFrame(
        [(0, None), (1, "hello world")], "doc_id long, text string"
    )
    got = {
        r["vec_id"]: np.array(r["embedding"])
        for r in embedding.hashed_doc_embedding(docs, dim=16).collect()
    }
    assert np.array_equal(got[0], np.zeros(16, dtype="float32"))
    assert np.linalg.norm(got[1]) > 0.99
