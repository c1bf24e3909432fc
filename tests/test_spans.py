"""Duplicated-passage (ExactSubstr-style) dedup: hand-computed goldens on
a tiny corpus, plus a full DuckDB re-derivation of the span algebra
(shingle → owner election → non-owner marks → island merge) over real
fixture documents with injected duplicate passages — the oracle groups by
the shingle TEXT, so it also cross-checks that 64-bit hashing introduced
no collision on the test corpus.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.operators import spans

SF = "/root/testdata/sf0.001"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_computed_spans_and_removal(spark):
    shared = "alpha beta gamma delta epsilon"  # 5 tokens, k=3 → 3 shingles
    rows = [
        (1, f"intro one two {shared} tail1 x"),
        (2, f"start {shared} tail2 y z"),
        (3, "completely unrelated words only here"),
    ]
    got = {
        (r["doc_id"], r["start_tok"], r["end_tok"])
        for r in spans.duplicate_spans(
            _df(spark, rows), "doc_id", "text", k=3
        ).collect()
    }
    # owner of every shared shingle is doc 1 (lowest doc_id); doc 2's
    # copy sits at tokens 1..5 → one merged span [1, 6)
    assert got == {(2, 1, 6)}

    cleaned = {
        r["doc_id"]: r["text"]
        for r in spans.remove_duplicate_spans(
            _df(spark, rows), "doc_id", "text", k=3
        ).collect()
    }
    assert cleaned[1] == rows[0][1]  # owner: byte-for-byte original
    assert cleaned[2] == "start tail2 y z"
    assert cleaned[3] == rows[2][1]


def test_adjacent_and_overlapping_marks_merge(spark):
    # two shared passages placed back-to-back in doc 2: coverage is
    # contiguous, so ONE span comes back, not two
    a = "p q r s"
    b = "t u v w"
    rows = [(1, f"left {a} mid {b} right"), (2, f"{a} {b} suffix here")]
    got = spans.duplicate_spans(_df(spark, rows), "doc_id", "text", k=4)
    assert [
        (r["doc_id"], r["start_tok"], r["end_tok"]) for r in got.collect()
    ] == [(2, 0, 8)]


def test_within_doc_repetition_keeps_first_occurrence(spark):
    phrase = "la li lu le lo"
    rows = [(7, f"{phrase} interlude {phrase}")]
    cleaned = spans.remove_duplicate_spans(
        _df(spark, rows), "doc_id", "text", k=5
    ).head()["text"]
    assert cleaned == f"{phrase} interlude"


def test_docs_below_resolution_floor_untouched(spark):
    rows = [(1, "same four tokens"), (2, "same four tokens")]
    assert (
        spans.duplicate_spans(_df(spark, rows), "doc_id", "text", k=5).count()
        == 0
    )
    out = spans.remove_duplicate_spans(
        _df(spark, rows), "doc_id", "text", k=5
    )
    assert {r["text"] for r in out.collect()} == {"same four tokens"}


def test_entirely_duplicated_doc_becomes_empty_not_dropped(spark):
    body = "only shared content lives here today"
    rows = [(1, f"{body} plus originality"), (2, body)]
    out = {
        r["doc_id"]: r["text"]
        for r in spans.remove_duplicate_spans(
            _df(spark, rows), "doc_id", "text", k=6
        ).collect()
    }
    assert out[1] == rows[0][1]
    assert out[2] == ""
    assert len(out) == 2  # no silent row deletion


def test_rejects_bad_params(spark):
    df = _df(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="k must be"):
        spans.duplicate_spans(df, "doc_id", "text", k=1)
    with pytest.raises(ValueError, match="hash_fn"):
        spans.duplicate_spans(df, "doc_id", "text", k=3, hash_fn="crc")


@pytest.fixture()
def injected_docs(spark):
    """Fixture documents with duplicated passages injected into a
    deterministic subset — realistic text around the duplicates."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    passage = (
        "this licence block is reproduced verbatim across documents "
        "and must count as one duplicated passage of many tokens"
    )
    return docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 3,
            F.concat_ws(" ", "text", F.lit(passage)),
        ).otherwise(F.col("text")),
    )


DUCK_SPANS = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\S+') AS t
  FROM docs
), sh AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(t[i : i + {k} - 1], ' ') AS s
  FROM toks, UNNEST(range(1, greatest(len(t) - {k} + 2, 1))) AS u(i)
), ranked AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY s ORDER BY doc_id, pos) AS rn,
         count(*) OVER (PARTITION BY s) AS c
  FROM sh
), marked AS (
  SELECT doc_id, pos, pos + {k} AS e FROM ranked WHERE c > 1 AND rn > 1
), flagged AS (
  SELECT doc_id, pos, e,
         CASE WHEN pos > coalesce(max(e) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS brk
  FROM marked
), islands AS (
  SELECT doc_id, pos, e,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS isl
  FROM flagged
)
SELECT doc_id, min(pos) AS start_tok, max(e) AS end_tok
FROM islands GROUP BY doc_id, isl
"""


def test_duckdb_rederivation_on_fixture_docs(spark, injected_docs):
    k = 8
    got = sorted(
        (r["doc_id"], r["start_tok"], r["end_tok"])
        for r in spans.duplicate_spans(
            injected_docs, "doc_id", "text", k=k
        ).collect()
    )
    con = duckdb.connect()
    con.register("docs", injected_docs.toPandas())
    want = sorted(
        map(tuple, con.execute(DUCK_SPANS.format(k=k)).fetchall())
    )
    assert got == want
    assert len(got) > 0  # the injection produced real duplicates


def test_md5_hash_path_matches_xxhash64(spark, injected_docs):
    a = sorted(
        map(
            tuple,
            spans.duplicate_spans(
                injected_docs, "doc_id", "text", k=8
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            spans.duplicate_spans(
                injected_docs, "doc_id", "text", k=8, hash_fn="md5"
            ).collect(),
        )
    )
    assert a == b


def test_owner_election_stays_hash_aggregable(spark):
    """The packed-long owner keeps the groupBy(h) a HashAggregate; a
    struct-min would silently fall back to SortAggregate (full
    per-partition sort of the shingle stream)."""
    df = _df(spark, [(1, "a b c d e f g"), (2, "a b c d e f h")])
    plan = (
        spans.duplicate_spans(df, "doc_id", "text", k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortAggregate" not in plan


def test_out_of_contract_doc_id_fails_loudly(spark):
    df = _df(spark, [(-1, "w x y z w x y z"), (2, "w x y z tail")])
    with pytest.raises(Exception, match="owner-packing contract"):
        spans.duplicate_spans(df, "doc_id", "text", k=4).collect()


def test_no_shuffle_carries_token_text(spark):
    """Narrow-signature rule: the exchange after the shingle explode must
    carry hashes, not shingle strings — assert no string shingle column
    crosses the first exchange."""
    df = _df(spark, [(1, "a b c d e f g"), (2, "a b c d e f h")])
    plan = (
        spans.duplicate_spans(df, "doc_id", "text", k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "array_join" not in m.group(1)


def test_many_disjoint_spans_rebuild_exact(spark):
    """Pathological shape for the r6 per-token F.exists (O(T×S)/doc): one
    doc carrying many disjoint duplicated passages. The gap-slice rebuild
    must cut every span and only the spans — verified against a Python
    replay of the documented span semantics."""
    k = 2
    # 40 distinct two-token passages, each repeated in doc 1..40, spaced
    # by unique filler so the spans in doc 0 stay disjoint
    passages = [f"dup{i}a dup{i}b" for i in range(40)]
    doc0_words = []
    for i, p in enumerate(passages):
        doc0_words.extend(p.split())
        doc0_words.append(f"filler{i}")
    rows = [(0, " ".join(doc0_words))] + [
        (i + 1, f"solo{i}x {p} solo{i}y") for i, p in enumerate(passages)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["text"]
        for r in spans.remove_duplicate_spans(
            df, "doc_id", "text", k=k
        ).collect()
    }
    # doc 0 owns every duplicated shingle (lowest (doc_id, pos)), so its
    # text survives byte-for-byte; each later doc loses its passage copy
    assert out[0] == rows[0][1]
    for i in range(40):
        assert out[i + 1] == f"solo{i}x solo{i}y"


def test_precomputed_spans_df_matches_internal_path(spark):
    """The spans_df fast path must be byte-identical to letting
    remove_duplicate_spans derive the spans itself."""
    passage = " ".join(f"shared{i}" for i in range(8))
    rows = [
        (1, f"alpha {passage} omega"),
        (2, f"beta {passage} gamma delta"),
        (3, "nothing duplicated here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sp = spans.duplicate_spans(df, "doc_id", "text", k=4)
    a = sorted(
        map(tuple, spans.remove_duplicate_spans(df, "doc_id", "text", k=4).collect())
    )
    b = sorted(
        map(
            tuple,
            spans.remove_duplicate_spans(
                df, "doc_id", "text", k=4, spans_df=sp
            ).collect(),
        )
    )
    assert a == b
    stats = {
        r["doc_id"]: (r["n_dup_spans"], r["span_tokens_cut"])
        for r in spans.remove_duplicate_spans(
            df, "doc_id", "text", k=4, keep_span_stats=True
        ).collect()
    }
    assert stats[3] == (0, 0)
    assert stats[2][0] >= 1 and stats[2][1] >= 8


def test_rebuild_property_arbitrary_disjoint_spans(spark):
    """Property: for ANY disjoint span set (injected via spans_df), the
    gap-slice rebuild equals the Python-list reference cut. Exercises
    empty docs, full-coverage docs, adjacent-to-end spans, and single-token
    gaps — shapes the pipeline-derived spans only hit incidentally."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @st.composite
    def doc_and_spans(draw):
        n = draw(st.integers(min_value=0, max_value=30))
        toks = [f"t{i}" for i in range(n)]
        spans_ = []
        pos = 0
        while pos < n:
            start = draw(st.integers(min_value=pos, max_value=n))
            if start >= n:
                break
            end = draw(st.integers(min_value=start + 1, max_value=n))
            spans_.append((start, end))
            pos = end + 1  # keep spans disjoint AND non-adjacent-mergeable
        return toks, spans_

    @settings(max_examples=12, deadline=None)
    @given(st.lists(doc_and_spans(), min_size=1, max_size=4))
    def check(cases):
        rows = [(i, " ".join(toks)) for i, (toks, _) in enumerate(cases)]
        span_rows = [
            (i, s, e)
            for i, (_, sps) in enumerate(cases)
            for (s, e) in sps
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        spdf = spark.createDataFrame(
            span_rows or [(-1, 0, 1)],  # dummy row keyed off-corpus
            "doc_id long, start_tok long, end_tok long",
        )
        out = {
            r["doc_id"]: r["text"]
            for r in spans.remove_duplicate_spans(
                df, "doc_id", "text", spans_df=spdf
            ).collect()
        }
        for i, (toks, sps) in enumerate(cases):
            covered = {p for (s, e) in sps for p in range(s, e)}
            expect = (
                " ".join(t for j, t in enumerate(toks) if j not in covered)
                if sps
                else " ".join(toks)  # untouched docs keep original text
            )
            assert out[i] == expect, (i, toks, sps)

    check()
