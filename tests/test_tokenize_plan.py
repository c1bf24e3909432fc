"""Tokenization stage (plans/tokenize.py): curated corpus → trained BPE →
encoded docs → packed sequences, with the packing budget accounted in REAL
BPE tokens (operators/text.pack_sequences token_count_col path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.operators import text
from vmware_sd_wan_velocloud_bi_intake_spark.plans.curation import curate_corpus
from vmware_sd_wan_velocloud_bi_intake_spark.plans.tokenize import (
    tokenize_and_pack,
)
from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table


def test_curate_tokenize_pack(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents", spread=True)
    curated = curate_corpus(docs, min_quality=0.2).curated
    tc = tokenize_and_pack(curated, num_merges=12, budget=256)
    n = curated.count()

    assert tc.merges.count() == 12
    enc = tc.tokenized.cache()
    assert enc.count() == n

    # BPE compresses: fewer tokens than characters, at least one per word
    stats = (
        enc.join(curated.select("doc_id", "text"), "doc_id")
        .select(
            (F.col("n_bpe_tokens") <= F.length("text")).alias("lt_chars"),
            (
                F.col("n_bpe_tokens")
                >= F.size(F.split(F.trim(F.col("text")), r"\s+"))
            ).alias("ge_words"),
        )
        .agg(F.min("lt_chars"), F.min("ge_words"))
        .head()
    )
    assert stats[0] and stats[1]

    packed = tc.packed.cache()
    assert packed.count() == n
    # packing accounted in BPE tokens: n_tokens carried by the packer is
    # exactly the encoder's count, and offsets stay inside the budget
    joined = packed.join(enc.select("doc_id", "n_bpe_tokens"), "doc_id")
    assert (
        joined.where(F.col("n_tokens") != F.col("n_bpe_tokens")).count() == 0
    )
    assert packed.where(
        (F.col("start_offset") < 0) | (F.col("start_offset") >= 256)
    ).count() == 0
    # chunk boundaries are the exact prefix sum: total tokens == final
    # document's (pack_id * budget + start_offset + n_tokens)
    total = enc.agg(F.sum("n_bpe_tokens")).head()[0]
    last = packed.orderBy(F.desc("pack_id"), F.desc("start_offset")).head()
    assert last["pack_id"] * 256 + last["start_offset"] + last["n_tokens"] == total
    enc.unpersist()
    packed.unpersist()


def test_pack_sequences_token_count_col(spark):
    rows = [(i, "ignored", c) for i, c in enumerate([100, 200, 50, 300])]
    df = spark.createDataFrame(rows, "doc_id long, text string, cnt long")
    out = text.pack_sequences(
        df, "doc_id", "text", budget=250, token_count_col="cnt"
    ).orderBy("doc_id")
    got = [(r["pack_id"], r["start_offset"], r["n_tokens"]) for r in out.collect()]
    # prefix sums: 0, 100, 300, 350 over budget 250
    assert got == [(0, 0, 100), (0, 100, 200), (1, 50, 50), (1, 100, 300)]
