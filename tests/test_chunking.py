"""Document chunking (operators/text.py: chunk_documents): hand-computed
window checks plus a DuckDB re-derivation over the fixture corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.operators import text
from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table

from .oracle_util import compare, run_oracle

_CHUNK, _OVER = 16, 4
_STRIDE = _CHUNK - _OVER

CHUNK_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\S+') AS w
  FROM documents
), sized AS (
  SELECT doc_id, w,
         GREATEST(CAST(ceil((len(w) - {_OVER})::DOUBLE / {_STRIDE}) AS INT), 1)
           AS n_chunks
  FROM toks
)
SELECT doc_id,
       i AS chunk_id,
       n_chunks,
       array_to_string(w[i * {_STRIDE} + 1 : i * {_STRIDE} + {_CHUNK}], ' ')
         AS chunk_text,
       len(regexp_extract_all(
           array_to_string(w[i * {_STRIDE} + 1 : i * {_STRIDE} + {_CHUNK}], ' '),
           '\S+')) AS n_chunk_tokens
FROM sized, LATERAL (SELECT unnest(generate_series(0, n_chunks - 1)) AS i)
"""


def test_chunking_model(spark):
    doc = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, doc), (2, "short doc"), (3, "")], ["doc_id", "text"])
    rows = text.chunk_documents(
        df, "doc_id", "text", chunk_tokens=4, overlap_tokens=1
    ).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: stride 3, ceil((10-1)/3)=3 chunks: [w0..w3], [w3..w6], [w6..w9]
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["chunk_text"] for r in c1] == [
        "w0 w1 w2 w3",
        "w3 w4 w5 w6",
        "w6 w7 w8 w9",
    ]
    assert all(r["n_chunks"] == 3 for r in c1)
    # consecutive chunks share exactly the overlap token
    assert c1[0]["chunk_text"].split()[-1] == c1[1]["chunk_text"].split()[0]
    # short + empty docs: single chunk, lineage total
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "short doc"
    # casing and punctuation survive chunking (training text, not a dedup key)
    cased = spark.createDataFrame(
        [(9, "The CEO said:\n\nHello World")], ["doc_id", "text"]
    )
    out = text.chunk_documents(
        cased, "doc_id", "text", chunk_tokens=100
    ).collect()[0]
    assert out["chunk_text"] == "The CEO said: Hello World"
    assert len(by_doc[3]) == 1 and by_doc[3][0]["n_chunk_tokens"] == 0


def test_chunking_validation(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="positive"):
        text.chunk_documents(df, "doc_id", "text", chunk_tokens=0)
    with pytest.raises(ValueError, match="overlap"):
        text.chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap_tokens=4)


def test_chunking_oracle_parity(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    spark_df = text.chunk_documents(
        docs, "doc_id", "text", chunk_tokens=_CHUNK, overlap_tokens=_OVER
    )
    oracle_pdf = run_oracle(CHUNK_ORACLE, sf_correct)
    # fixture docs are long enough that chunking must actually split some
    assert (oracle_pdf["n_chunks"] > 1).any()
    issues = compare(spark_df, oracle_pdf)
    assert not issues, " | ".join(issues)
