"""Feature-hashing document embeddings (the hashing trick, Weinberger et
al. 2009 — public domain technique): token → md5 bucket with an md5 sign
bit, counts accumulated into a dense ``dim``-vector, L2-normalized.

This links the text surface to the vector surface WITHOUT a model: any
documents table gains an ``embedding array<float>`` column that the
engine's whole vector stack consumes unchanged — brute-force/IVF/PQ ANN,
SemDeDup semantic dedup, int8 quantization. Near-duplicate texts land on
near-identical vectors (token multiset differences of a few tokens move
the normalized vector by O(1/√n_tokens)), which is exactly the signal
embedding-based dedup needs.

Shape: map-only Arrow-batched kernel (dense per-row accumulation is the
documented Python carve-out — an explode → groupBy(doc, bucket) → pivot
formulation would shuffle the corpus token-by-token). Hashing is md5 on
token bytes, so embeddings are bit-deterministic across runs, engines,
and partitionings; per-batch token memoization bounds the hashing cost at
O(distinct tokens per batch), the same cache shape as the BPE encoder.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import normalize_text


def _token_slot(token: str, dim: int) -> tuple[int, float]:
    """(bucket, sign) from independent md5 bits — deterministic, engine-
    portable, and shared by the kernel and the test replay."""
    h = hashlib.md5(token.encode("utf-8")).digest()
    bucket = int.from_bytes(h[:8], "big") % dim
    sign = 1.0 if h[8] & 1 else -1.0
    return bucket, sign


def hashed_doc_embedding(
    docs: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
) -> DataFrame:
    """(vec_id, embedding) — hashed-count embeddings, L2-normalized.

    Column names match the ``embeddings`` table contract so the output
    drops straight into every vector operator. Empty documents embed as
    the zero vector (norm guard, not NaN).
    """

    def gen(batches):
        import numpy as np
        import pandas as pd

        memo: dict[str, tuple[int, float]] = {}

        def slot(tok):
            got = memo.get(tok)
            if got is None:
                got = memo[tok] = _token_slot(tok, dim)
            return got

        for pdf in batches:
            out = np.zeros((len(pdf), dim), dtype="float64")
            for i, t in enumerate(pdf["_norm"]):
                for tok in t.split(" "):
                    if tok:
                        b, s = slot(tok)
                        out[i, b] += s
            norms = np.linalg.norm(out, axis=1, keepdims=True)
            out = out / np.maximum(norms, 1e-12)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["doc_id"],
                    "embedding": [row.astype("float32") for row in out],
                }
            )

    staged = docs.select(
        F.col(doc_id).alias("doc_id"),
        F.coalesce(normalize_text(F.col(text_col)), F.lit("")).alias("_norm"),
    )
    return staged.mapInPandas(
        gen, schema="vec_id long, embedding array<float>"
    )
