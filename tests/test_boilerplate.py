"""Boilerplate-line removal (operators/text.py: line_frequencies /
remove_boilerplate): model checks on adversarial inputs plus a full
DuckDB re-derivation over the fixture corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.operators import text
from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table

from .oracle_util import compare, run_oracle

BOILER_ORACLE = """
WITH docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN 'SUBSCRIBE NOW' || chr(10) || text || chr(10) || 'COOKIE NOTICE'
              ELSE text END AS text
  FROM documents
), lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) AS pos
  FROM docs
), freq AS (
  SELECT line, COUNT(*) AS doc_freq
  FROM (SELECT DISTINCT doc_id, line FROM lines)
  GROUP BY line
), boiler AS (SELECT line FROM freq WHERE doc_freq >= 5),
kept AS (
  SELECT l.doc_id, l.line, l.pos FROM lines l
  ANTI JOIN boiler b ON l.line = b.line
)
SELECT d.doc_id,
       COALESCE(k.rebuilt, '') AS text
FROM docs d
LEFT JOIN (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS rebuilt
  FROM kept GROUP BY doc_id
) k USING (doc_id)
"""


def test_remove_boilerplate_model(spark):
    rows = [
        (1, "HEADER\nreal content one\nFOOTER"),
        (2, "HEADER\nreal content two\nFOOTER"),
        (3, "HEADER\nreal content three\nFOOTER"),
        (4, "HEADER\nHEADER\nonly header repeats inside"),  # own-repeat
        (5, "HEADER\nFOOTER"),  # all boilerplate -> empty
        (6, "unique doc, single line"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    freq = {
        r["line"]: r["doc_freq"]
        for r in text.line_frequencies(df, "doc_id", "text").collect()
    }
    # per-doc dedup: doc 4's double HEADER counts once
    assert freq["HEADER"] == 5
    assert freq["FOOTER"] == 4
    assert freq["real content one"] == 1

    out = {
        r["doc_id"]: r["text"]
        for r in text.remove_boilerplate(
            df, "doc_id", "text", max_doc_freq=4
        ).collect()
    }
    assert out[1] == "real content one"
    assert out[4] == "only header repeats inside"
    assert out[5] == ""  # kept as a row, emptied — gate drops it later
    assert out[6] == "unique doc, single line"
    assert len(out) == 6  # no silent row deletion


def test_remove_boilerplate_preserves_line_order(spark):
    df = spark.createDataFrame(
        [(1, "z last\nBOILER\na first\nBOILER\nm middle"), (2, "BOILER")],
        ["doc_id", "text"],
    )
    out = text.remove_boilerplate(df, "doc_id", "text", max_doc_freq=2).collect()
    got = {r["doc_id"]: r["text"] for r in out}
    assert got[1] == "z last\na first\nm middle"  # original order, not sorted


def test_remove_boilerplate_oracle_parity(spark, sf_correct):
    base = load_table(spark, sf_correct, "documents")
    docs = base.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("SUBSCRIBE NOW\n"), F.col("text"), F.lit("\nCOOKIE NOTICE")
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    spark_df = text.remove_boilerplate(docs, "doc_id", "text", max_doc_freq=5)
    oracle_pdf = run_oracle(BOILER_ORACLE, sf_correct)
    # the injected chrome must actually have been removed somewhere
    assert (
        spark_df.where(F.col("text").contains("SUBSCRIBE NOW")).count() == 0
    )
    issues = compare(spark_df, oracle_pdf)
    assert not issues, " | ".join(issues)


def test_delimiter_is_literal_not_regex(spark):
    df = spark.createDataFrame(
        [(1, "HEAD|one|TAIL"), (2, "HEAD|two|TAIL"), (3, "HEAD|three|TAIL")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["text"]
        for r in text.remove_boilerplate(
            df, "doc_id", "text", max_doc_freq=3, delimiter="|"
        ).collect()
    }
    assert out[1] == "one" and out[2] == "two" and out[3] == "three"
