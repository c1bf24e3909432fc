"""End-to-end corpus curation pipeline over the documents fixture.

Each stage's contract is re-verified independently of the operators'
own tests: redaction leaves no matchable PII, gates are exactly the
predicate, dedup survivors match a single-process union-find over the
same pairs, decontamination drops exactly the over-threshold docs.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.operators import dedup, text
from vmware_sd_wan_velocloud_bi_intake_spark.plans.curation import curate_corpus
from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table

from .test_components import union_find_components


@pytest.fixture(scope="module")
def docs(spark, sf_smoke):
    base = load_table(spark, sf_smoke, "documents")
    # salt a few rows with PII so redaction has real work
    return base.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 17 == 0,
            F.concat(
                F.col("text"),
                F.lit(" reach me at u"),
                F.col("doc_id").cast("string"),
                F.lit("@corp.example or 10.0.0."),
                (F.col("doc_id") % 200).cast("string"),
            ),
        ).otherwise(F.col("text")),
    )


@pytest.fixture(scope="module")
def blocklist(docs):
    return docs.where("doc_id % 31 = 0").select("doc_id", "text")


@pytest.fixture(scope="module")
def suspects(docs, blocklist):
    # inject shifted-id copies of a few blocklist docs so decontamination
    # deterministically has true positives to drop
    leaked = blocklist.where("doc_id % 3 = 0").select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
        "text",
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )
    return docs.where("doc_id % 31 != 0").unionByName(
        leaked, allowMissingColumns=False
    )


@pytest.fixture(scope="module")
def result(suspects, blocklist):
    return curate_corpus(
        suspects, blocklist=blocklist, min_quality=0.2, decon_threshold=0.5
    )


def test_stage_counts_monotone_and_audit_consistent(result):
    audit = {r["stage"]: r["n_docs"] for r in result.audit().collect()}
    assert (
        audit["redacted"]
        >= audit["gated"]
        >= audit["exact_kept"]
        >= audit["near_kept"]
        >= audit["curated"]
    )
    assert audit["curated"] > 0


def test_redaction_removes_all_pii(result):
    rows = result.curated.select("text").collect()
    pats = [re.compile(p) for _, p in text.PII_PATTERNS]
    for r in rows:
        for p in pats:
            assert not p.search(r["text"]), r["text"][:120]


def test_gate_is_exactly_the_predicate(result):
    bad = result.gated.where(
        text.quality_score(F.col("text")) < F.lit(0.2)
    ).count()
    assert bad == 0


def test_near_dup_survivors_match_union_find(result):
    pairs = dedup.near_dup_pairs(
        result.exact_kept, "doc_id", "text", threshold=0.4,
        num_hashes=4, bands=2, shingle_n=3,
    )
    edges = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    losers = {v for v, c in union_find_components(edges).items() if v != c}
    expected = {
        r["doc_id"] for r in result.exact_kept.select("doc_id").collect()
    } - losers
    got = {r["doc_id"] for r in result.near_kept.select("doc_id").collect()}
    assert got == expected


def test_decontamination_drops_exactly_over_threshold(result, blocklist):
    # the pipeline shingles suspects post-redaction, so the blocklist is
    # redacted identically before comparison (see curate_corpus stage 5)
    scrubbed = blocklist.select(text.redact_pii(F.col("text")).alias("text"))
    ratios = dedup.contamination_ratios(
        result.near_kept, scrubbed, "doc_id", "text", shingle_n=3
    )
    over = {
        r["doc_id"] for r in ratios.where("overlap >= 0.5").collect()
    }
    kept = {r["doc_id"] for r in result.curated.select("doc_id").collect()}
    near = {r["doc_id"] for r in result.near_kept.select("doc_id").collect()}
    assert kept == near - over
    assert over, "salted fixture should contaminate at least one doc"


def test_curated_ids_unique(result):
    n = result.curated.count()
    assert result.curated.select("doc_id").distinct().count() == n


def test_perplexity_gate_drops_exactly_over_cap(spark, docs):
    """The LM gate must drop exactly the documents whose perplexity
    (under a model trained on the heuristically-gated survivors) exceeds
    the cap — re-derived here with the lm operators directly."""
    from vmware_sd_wan_velocloud_bi_intake_spark.operators import lm

    base = curate_corpus(docs, min_quality=0.2)
    gated_ids = {r["doc_id"] for r in base.gated.select("doc_id").collect()}

    model = lm.train_bigram_lm(base.gated, min_count=2)
    scored = lm.score_bigram_logprob(base.gated, model).collect()
    ppls = sorted(r["perplexity"] for r in scored if r["perplexity"] is not None)
    # a cap inside the observed range, so the gate provably fires
    cap = ppls[int(len(ppls) * 0.8)]
    expect_kept = {
        r["doc_id"]
        for r in scored
        if r["perplexity"] is None or r["perplexity"] <= cap
    }
    assert expect_kept < gated_ids  # strictly smaller: the gate fires

    gated = curate_corpus(docs, min_quality=0.2, max_perplexity=cap)
    got = {r["doc_id"] for r in gated.gated.select("doc_id").collect()}
    assert got == expect_kept
    # the LM gate persists the pre-gate corpus (materialized by training's
    # vocab action) so scoring/semi-join/dedup reuse one evaluation;
    # release() must hand the memory back and be idempotent
    assert len(gated.cached) == 1
    assert gated.cached[0].storageLevel.useMemory
    released = gated.cached[0]
    gated.release()
    assert not released.storageLevel.useMemory
    gated.release()
    # without the LM gate nothing is persisted
    assert base.cached == []
    # and with the gate off, nothing changes vs the base run
    assert {
        r["doc_id"] for r in base.curated.select("doc_id").collect()
    } == {
        r["doc_id"]
        for r in curate_corpus(docs, min_quality=0.2).curated.collect()
    }


def test_boilerplate_stage_strips_chrome_before_gate(spark, docs):
    """With boilerplate_doc_freq set, injected template lines vanish from
    the redacted frame (and so from everything downstream); off by
    default the text passes through untouched."""
    chromed = docs.select(
        "doc_id",
        F.concat(F.lit("SUBSCRIBE NOW\n"), F.col("text")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    res = curate_corpus(chromed, min_quality=0.2, boilerplate_doc_freq=5)
    assert (
        res.redacted.where(F.col("text").contains("SUBSCRIBE NOW")).count() == 0
    )
    # real content survives: stripped text = original text (post-redaction)
    base = curate_corpus(docs, min_quality=0.2)
    a = {r["doc_id"]: r["text"] for r in res.redacted.collect()}
    b = {r["doc_id"]: r["text"] for r in base.redacted.collect()}
    assert a == b


# slow tier (r14 re-tier, VERDICT r13 #2): quality property of the span stage; the spans operator unit tests + the dedup_survivors vehicle hash keep the class default
@pytest.mark.slow
def test_passage_dedup_stage_cuts_shared_passages(spark, docs):
    from vmware_sd_wan_velocloud_bi_intake_spark.operators import spans

    passage = (
        "standard disclaimer text repeated verbatim across many documents "
        "for exactly this passage dedup stage to find and remove"
    )
    salted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 2,
            F.concat_ws(" ", "text", F.lit(passage)),
        ).otherwise(F.col("text")),
    )
    res = curate_corpus(
        salted, min_quality=0.0, passage_dedup_k=8
    )
    try:
        out = res.curated
        # no k-gram of the injected passage survives more than once
        hits = out.where(F.col("text").contains(passage)).count()
        assert hits == 1  # exactly the owner keeps the passage
        # stage equivalence: curated == remove_duplicate_spans(near_kept)
        want = spans.remove_duplicate_spans(
            res.near_kept, "doc_id", "text", k=8
        )
        got_rows = {(r["doc_id"], r["text"]) for r in out.collect()}
        want_rows = {(r["doc_id"], r["text"]) for r in want.collect()}
        assert got_rows == want_rows
        # audit exposes the stage
        stages = {r["stage"] for r in res.audit().collect()}
        assert "passage_nonempty" in stages
    finally:
        res.release()
