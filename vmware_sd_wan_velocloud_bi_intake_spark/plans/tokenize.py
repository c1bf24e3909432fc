"""Tokenization stage of the training-data pipeline: curated corpus →
trained BPE → token ids per document → fixed-budget sequence packing.

Sits between `plans/curation.py` (what survives) and
`operators/export.py` (how it ships): train the subword vocabulary ON the
curated corpus (training a tokenizer on pre-curation text bakes boilerplate
and PII fragments into the merge table — same scrub-first principle as the
curation order), encode every document, and pack the token stream into
training sequences using the REAL token counts, not the whitespace proxy.

Scale: train_bpe is one corpus shuffle + vocab-sized iterations; encoding
is map-only; packing is the exact distributed prefix sum of
operators/text.pack_sequences. No stage funnels the corpus to the driver —
only the merge table (num_merges rows) lives there.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..operators import bpe, text


@dataclass
class TokenizedCorpus:
    merges: DataFrame     # (rank, left, right, pair_count) — the tokenizer
    tokenized: DataFrame  # (doc_id, tokens, n_bpe_tokens)
    packed: DataFrame     # (doc_id, n_tokens, pack_id, start_offset, ...)


def tokenize_and_pack(
    curated: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    *,
    num_merges: int = 64,
    min_count: int = 2,
    budget: int = 512,
    drop_oversize: bool = False,
) -> TokenizedCorpus:
    """Train BPE on the corpus, encode it, and pack to ``budget``-token
    sequences. Training runs Spark jobs AT CALL TIME (each merge argmax is
    an action); encode/pack stay lazy."""
    merges = bpe.train_bpe(
        curated, text_col=text_col, num_merges=num_merges, min_count=min_count
    )
    tokenized = bpe.bpe_encode(
        curated, merges, doc_id=doc_id, text_col=text_col
    )
    packed = text.pack_sequences(
        tokenized,
        "doc_id",
        "tokens",
        budget=budget,
        drop_oversize=drop_oversize,
        token_count_col="n_bpe_tokens",
    )
    return TokenizedCorpus(merges=merges, tokenized=tokenized, packed=packed)
