"""Concat-and-chunk sequence packing (operators/text.pack_sequences).

Verified against a direct single-process model of the packing definition:
concatenate docs in (key, doc_id) order, cut the token stream every
``budget`` tokens, assign each doc to its starting chunk.
"""

from __future__ import annotations

from vmware_sd_wan_velocloud_bi_intake_spark.operators.text import pack_sequences
from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table

BUDGET = 64


def _model(docs: list[tuple[int, int]], budget: int):
    """docs = [(doc_id, n_tokens)] sorted by doc_id → {doc_id: (pack, off, end)}"""
    out, before = {}, 0
    for did, n in docs:
        out[did] = (
            before // budget,
            before % budget,
            (before + max(n, 1) - 1) // budget,
        )
        before += n
    return out


def test_packing_matches_model_and_is_exact(spark):
    rows = [(i, "tok " * ((i * 7) % 40)) for i in range(60)]  # 0..39 tokens
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["pack_id"], r["start_offset"], r["end_chunk"])
        for r in pack_sequences(df, "doc_id", "text", BUDGET).collect()
    }
    toks = [(i, ((i * 7) % 40)) for i in range(60)]
    assert got == _model(toks, BUDGET)


def test_packing_is_partitioned_and_deterministic(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    a = pack_sequences(docs, "doc_id", "text", 512, partition_by="source").collect()
    b = pack_sequences(docs, "doc_id", "text", 512, partition_by="source").collect()
    key = lambda r: (r["source"], r["doc_id"])
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # per-partition invariants: offsets inside the budget, pack ids start at
    # 0 and are contiguous, pack_seq numbers docs within a chunk from 1
    by_src: dict = {}
    for r in a:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        assert all(0 <= r["start_offset"] < 512 for r in rs)
        packs = sorted({r["pack_id"] for r in rs})
        assert packs[0] == 0 and packs == list(range(len(packs)))
        rs.sort(key=lambda r: (r["pack_id"], r["pack_seq"]))
        # cumulative reconstruction: offset == running token total mod budget
        before = 0
        for r in sorted(rs, key=lambda r: r["doc_id"]):
            assert r["start_offset"] == before % 512
            assert r["pack_id"] == before // 512
            before += r["n_tokens"]


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=90), min_size=1, max_size=25),
    budget=st.integers(min_value=1, max_value=64),
)
def test_packing_matches_model_on_arbitrary_inputs(spark, sizes, budget):
    # includes empty docs (0 tokens: stay at the cursor, consume nothing)
    # and docs far larger than the budget (span multiple chunks)
    rows = [(i, "t " * n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["pack_id"], r["start_offset"], r["end_chunk"])
        for r in pack_sequences(df, "doc_id", "text", budget).collect()
    }
    assert got == _model(list(enumerate(sizes)), budget)


def test_global_packing_is_distributed_and_deterministic(spark, sf_smoke):
    """partition_by=None must NOT funnel the corpus through one window task:
    the two-pass path (range partition → per-partition prefix + broadcast
    offsets) has to reproduce the exact global model, stably across runs."""
    docs = load_table(spark, sf_smoke, "documents")
    out = pack_sequences(docs, "doc_id", "text", 256)
    # no constant-partitioned window in the plan (the single-task shape)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY" in plan.upper() or "rangepartitioning" in plan.lower()
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, pack_sequences(docs, "doc_id", "text", 256).collect()))
    assert a == b  # partition ids and offsets are deterministic across runs
    # global cumulative reconstruction in doc_id order
    rows = sorted(out.collect(), key=lambda r: r["doc_id"])
    before = 0
    for r in rows:
        assert r["start_offset"] == before % 256
        assert r["pack_id"] == before // 256
        assert r["end_chunk"] == (before + max(r["n_tokens"], 1) - 1) // 256
        before += r["n_tokens"]
    # pack_seq numbers docs 1..m within each global chunk even when a chunk
    # spans two physical partitions
    by_pack: dict = {}
    for r in rows:
        by_pack.setdefault(r["pack_id"], []).append(r["pack_seq"])
    for seqs in by_pack.values():
        assert sorted(seqs) == list(range(1, len(seqs) + 1))


def test_drop_oversize_filters_long_docs(spark):
    rows = [(1, "a " * 10), (2, "b " * 100), (3, "c " * 10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = pack_sequences(df, "doc_id", "text", 32, drop_oversize=True).collect()
    assert sorted(r["doc_id"] for r in kept) == [1, 3]
    # and without the flag the long doc spans chunks: end_chunk > pack_id
    spans = {
        r["doc_id"]: (r["pack_id"], r["end_chunk"])
        for r in pack_sequences(df, "doc_id", "text", 32).collect()
    }
    assert spans[2][1] > spans[2][0]
