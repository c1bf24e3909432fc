"""Bigram language-model training + perplexity scoring (operators/lm.py).

A hand-computed model pins the smoothing arithmetic; the DuckDB oracle
re-derives the full train-then-score pipeline over the sf0.01 documents
fixture and must agree to 6 decimal places.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.operators import lm
from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table

from .oracle_util import compare, run_oracle

_K = 0.5
_MIN_COUNT = 2

LM_ORACLE = rf"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
  FROM documents
), toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
occ AS (
  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
  FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
  WHERE len(w) > 1
), big AS (
  SELECT w1, w2, COUNT(*) AS n_big FROM occ GROUP BY 1, 2
  HAVING COUNT(*) >= {_MIN_COUNT}
), ctx AS (SELECT w1, COUNT(*) AS n_ctx FROM occ GROUP BY 1),
vocab AS (
  SELECT COUNT(DISTINCT x) AS v FROM (SELECT unnest(w) AS x FROM toks)
), probs AS (
  SELECT o.doc_id,
         (COALESCE(b.n_big, 0)::DOUBLE + {_K})
           / (COALESCE(c.n_ctx, 0)::DOUBLE + {_K} * vocab.v) AS p
  FROM occ o
  LEFT JOIN big b USING (w1, w2)
  LEFT JOIN ctx c USING (w1)
  CROSS JOIN vocab
), s AS (
  SELECT doc_id, COUNT(*) AS n_bigrams, AVG(log2(p)) AS avg_log2p
  FROM probs GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(s.n_bigrams, 0) AS n_bigrams,
       ROUND(s.avg_log2p, 6) AS avg_log2p_r6,
       ROUND(POWER(2.0, -s.avg_log2p), 6) AS ppl_r6
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN s USING (doc_id)
"""


def _score_rounded(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    model = lm.train_bigram_lm(docs, min_count=_MIN_COUNT, smoothing_k=_K)
    scored = lm.score_bigram_logprob(docs, model)
    return model, scored.select(
        "doc_id",
        "n_bigrams",
        F.round("avg_log2p", 6).alias("avg_log2p_r6"),
        F.round("perplexity", 6).alias("ppl_r6"),
    )


def test_lm_oracle_parity(spark, sf_correct):
    _, scored = _score_rounded(spark, sf_correct)
    oracle_pdf = run_oracle(LM_ORACLE, sf_correct)
    assert oracle_pdf.shape[0] > 0
    issues = compare(scored, oracle_pdf)
    assert not issues, " | ".join(issues)


def test_lm_hand_model(spark):
    """Corpus 'a b a b' + 'a b c': check every smoothed term by hand."""
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "solo")], ["doc_id", "text"]
    )
    model = lm.train_bigram_lm(docs, min_count=2, smoothing_k=0.5)
    # bigram occurrences: (a,b)x3 (b,a)x1 (b,c)x1 -> pruned to {(a,b):3}
    assert {(r["w1"], r["w2"], r["n_big"]) for r in model.bigrams.collect()} == {
        ("a", "b", 3)
    }
    # contexts: a->3, b->2; vocab = {a,b,c,solo} = 4
    assert {(r["w1"], r["n_ctx"]) for r in model.contexts.collect()} == {
        ("a", 3),
        ("b", 2),
    }
    assert model.vocab_size == 4

    got = {
        r["doc_id"]: r
        for r in lm.score_bigram_logprob(docs, model).collect()
    }
    v, k = 4.0, 0.5
    p_ab = (3 + k) / (3 + k * v)  # seen bigram
    p_ba = (0 + k) / (2 + k * v)  # pruned bigram, seen context b
    expect_d1 = (2 * math.log2(p_ab) + math.log2(p_ba)) / 3
    assert got[1]["n_bigrams"] == 3
    assert abs(got[1]["avg_log2p"] - expect_d1) < 1e-12
    p_bc = (0 + k) / (2 + k * v)
    expect_d2 = (math.log2(p_ab) + math.log2(p_bc)) / 2
    assert abs(got[2]["avg_log2p"] - expect_d2) < 1e-12
    assert abs(got[2]["perplexity"] - 2 ** -expect_d2) < 1e-9
    # single-token doc: present, zero bigrams, NULL score
    assert got[3]["n_bigrams"] == 0 and got[3]["avg_log2p"] is None


def test_lm_unseen_context_uniform_floor(spark):
    """A context absent from training: P = k/(kV) = 1/V exactly."""
    train = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
    model = lm.train_bigram_lm(train, min_count=1, smoothing_k=0.5)
    assert model.vocab_size == 2
    score = lm.score_bigram_logprob(
        spark.createDataFrame([(9, "zz qq")], ["doc_id", "text"]), model
    ).collect()[0]
    assert abs(score["avg_log2p"] - math.log2(1 / 2)) < 1e-12


def test_lm_empty_training_corpus_raises(spark):
    """vocab_size == 0 would zero the smoothing denominator for unseen
    contexts — Spark's non-ANSI division NULLs where DuckDB's IEEE float
    path gives -inf via log2, a silent cross-engine divergence. Training
    must fail loudly instead (ADVICE r12)."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="vocab_size == 0"):
        lm.train_bigram_lm(empty, min_count=1, smoothing_k=0.5)


def test_lm_score_broadcasts_model(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    model = lm.train_bigram_lm(docs)
    plan = (
        lm.score_bigram_logprob(docs, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_lm_context_broadcast_is_statistics_driven(spark, sf_smoke):
    """The trained vocab_size statistic drives the contexts-join strategy:
    small vocab -> both model joins carry a broadcast hint; a model claiming
    a web-scale vocabulary keeps the hint off the unpruned contexts table
    (AQE decides from runtime sizes instead of a forced driver collect)."""
    docs = load_table(spark, sf_smoke, "documents")
    model = lm.train_bigram_lm(docs)
    assert model.vocab_size <= lm.CONTEXT_BROADCAST_MAX_VOCAB

    def n_hints(m):
        plan = (
            lm.score_bigram_logprob(docs, m)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        return plan.count("rightHint=(strategy=broadcast)")

    assert n_hints(model) == 2
    big_vocab = lm.BigramLM(
        bigrams=model.bigrams,
        contexts=model.contexts,
        vocab_size=lm.CONTEXT_BROADCAST_MAX_VOCAB + 1,
        smoothing_k=model.smoothing_k,
    )
    assert n_hints(big_vocab) == 1


def test_lm_materialize_and_complete_flags(spark):
    """materialize=True must not change the model; complete=False drops
    exactly the zero-bigram docs and keeps identical scores elsewhere."""
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "solo")], ["doc_id", "text"]
    )
    m_lazy = lm.train_bigram_lm(docs, min_count=2, smoothing_k=0.5)
    m_ckpt = lm.train_bigram_lm(
        docs, min_count=2, smoothing_k=0.5, materialize=True
    )
    assert sorted(map(tuple, m_lazy.bigrams.collect())) == sorted(
        map(tuple, m_ckpt.bigrams.collect())
    )
    assert sorted(map(tuple, m_lazy.contexts.collect())) == sorted(
        map(tuple, m_ckpt.contexts.collect())
    )
    assert m_lazy.vocab_size == m_ckpt.vocab_size

    full = {r["doc_id"]: r for r in lm.score_bigram_logprob(docs, m_ckpt).collect()}
    part = {
        r["doc_id"]: r
        for r in lm.score_bigram_logprob(docs, m_ckpt, complete=False).collect()
    }
    assert set(part) == {1, 2}  # doc 3 has no bigrams -> absent
    for d in part:
        assert part[d]["avg_log2p"] == full[d]["avg_log2p"]
        assert part[d]["n_bigrams"] == full[d]["n_bigrams"]


@pytest.mark.parametrize(
    "seed",
    [19, pytest.param(43, marks=pytest.mark.slow)],  # two-tier rule
)
def test_txt_profile_oracle_on_random_corpora(spark, tmp_path, seed):
    """The full profile vehicle — including the r12 slice-trained LM
    rider columns — against its in-CTE DuckDB oracle on seeded random
    corpora (repeated-phrase chains so the trained slice actually prunes
    and scores non-uniformly): the 'green at any fixture' claim for the
    train-then-score replay."""
    import duckdb
    import numpy as np

    from vmware_sd_wan_velocloud_bi_intake_spark.queries.textvec import (
        TXT_PROFILE_ORACLE,
        txt_profile,
    )

    from .oracle_util import canonical_rows

    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(10)]
    rows = []
    for i in range(40):
        n = rng.randint(3, 16)
        toks = list(rng.choice(vocab, size=n))
        if i % 4 == 0:  # repeated bigram runs -> pruned-vs-kept coverage
            toks += ["the", "net", "the", "net"]
        rows.append((i + 1, "xx", "rand", " ".join(toks)))
    sf = tmp_path / f"sf_lm{seed}"
    sf.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    ).coalesce(1).write.parquet(str(sf / "documents.parquet"))

    spdf = txt_profile(spark, str(sf)).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM parquet_scan('{sf}/documents.parquet/*.parquet')"
    )
    odf = con.execute(TXT_PROFILE_ORACLE).fetchdf()
    assert sorted(spdf.columns) == sorted(odf.columns)
    assert len(spdf) == len(odf) == 40
    # the slice must have trained a non-trivial model: at least one doc
    # scored by surviving (min-count) bigrams, i.e. scores vary
    assert spdf["lm_avg_log2p_r6"].nunique() > 1
    assert canonical_rows(spdf) == canonical_rows(odf)
