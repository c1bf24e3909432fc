"""Deterministic stratified sampling (operators/sampling.py)."""

from __future__ import annotations

import collections
import math

from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.operators.sampling import (
    stratified_cap,
    stratified_fraction,
)
from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table


def _counts(rows, col):
    return collections.Counter(r[col] for r in rows)


def test_cap_bounds_every_stratum_and_passes_small_ones(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    full = _counts(docs.select("source").collect(), "source")
    capped = stratified_cap(docs, "source", "doc_id", 50).collect()
    got = _counts(capped, "source")
    for src, n in full.items():
        assert got[src] == min(n, 50), (src, n, got[src])


def test_cap_is_deterministic_across_runs_and_layouts(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    a = {r["doc_id"] for r in stratified_cap(docs, "source", "doc_id", 30).collect()}
    b = {
        r["doc_id"]
        for r in stratified_cap(
            docs.repartition(13), "source", "doc_id", 30
        ).collect()
    }
    assert a == b and len(a) > 0


def test_fraction_is_exact_per_stratum(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    full = _counts(docs.select("source").collect(), "source")
    # 0.07 regression-tests the float-ceil guard: 100 * 0.07 is
    # 7.000000000000001 in doubles and naive ceil would keep 8 rows
    for frac in (0.25, 0.07):
        kept = stratified_fraction(docs, "source", "doc_id", frac).collect()
        got = _counts(kept, "source")
        for src, n in full.items():
            exact = math.ceil(round(n * frac, 9))
            assert got[src] == exact, (frac, src, n, got[src])


def test_temperature_mixture_targets_and_determinism(spark):
    from vmware_sd_wan_velocloud_bi_intake_spark.operators.sampling import (
        temperature_mixture,
    )

    rows = (
        [(i, "big") for i in range(900)]
        + [(1000 + i, "mid") for i in range(90)]
        + [(2000 + i, "small") for i in range(10)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "source"])

    out = temperature_mixture(df, "source", "doc_id", total_rows=100, alpha=0.5)
    got = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # largest-remainder apportionment over targets 70.34 / 22.24 / 7.41:
    # floors 70/22/7, the one leftover row goes to the largest remainder
    # (small, .41) — and the total is EXACTLY total_rows
    assert got == {"big": 70, "mid": 22, "small": 8}
    assert sum(got.values()) == 100
    # alpha=0.5 lifts the tail vs proportional (which would give small ~1)
    assert got["small"] > 100 * 10 / 1000

    # alpha=1 = proportional; alpha=0 = equal shares (capped by size)
    prop = {
        r["source"]: r["n"]
        for r in temperature_mixture(df, "source", "doc_id", 100, alpha=1.0)
        .groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert prop["big"] == 90 and prop["small"] == 1
    eq = {
        r["source"]: r["n"]
        for r in temperature_mixture(df, "source", "doc_id", 90, alpha=0.0)
        .groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # equal thirds (30 each), small exhausts at 10 and its shortfall
    # redistributes so the realized total still hits total_rows
    assert eq == {"big": 40, "mid": 40, "small": 10}
    assert sum(eq.values()) == 90

    # deterministic membership across layouts
    a = {r["doc_id"] for r in out.collect()}
    b = {
        r["doc_id"]
        for r in temperature_mixture(
            df.repartition(17), "source", "doc_id", 100, alpha=0.5
        ).collect()
    }
    assert a == b


def test_temperature_mixture_null_stratum_and_big_leftover(spark):
    from vmware_sd_wan_velocloud_bi_intake_spark.operators.sampling import (
        _apportion,
        temperature_mixture,
    )

    # NULL is a real stratum: counted, capped, and joined back null-safely
    rows = [(i, None) for i in range(50)] + [(100 + i, "en") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = temperature_mixture(df, "source", "doc_id", total_rows=20, alpha=1.0)
    got = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert got == {None: 10, "en": 10}

    # all-NULL stratum column must not crash schema inference
    allnull = spark.createDataFrame(
        [(i, None) for i in range(10)], "doc_id int, source string"
    )
    assert temperature_mixture(allnull, "source", "doc_id", 4).count() == 4

    # apportionment is arithmetic per round, not one iteration per row:
    # a huge leftover against one open stratum must resolve instantly
    import time

    t0 = time.perf_counter()
    caps = _apportion({"a": 1.0, "b": 1.0}, {"a": 10**9, "b": 10}, 10**8)
    assert caps == {"a": 10**8 - 10, "b": 10}
    assert time.perf_counter() - t0 < 1.0


def test_cluster_balanced_sample_balances_skewed_topics(spark):
    """Two well-separated synthetic topics with a 9:1 size skew; at
    alpha=0 the balanced draw takes an equal share from each cluster
    (a dominant topic stops drowning the mixture), deterministically."""
    from vmware_sd_wan_velocloud_bi_intake_spark.operators.sampling import (
        cluster_balanced_sample,
    )
    from vmware_sd_wan_velocloud_bi_intake_spark.operators.similarity import (
        train_centroids,
    )

    dim = 8
    rows = []
    # topic A (ids 0..179): mass on axis 0; topic B (ids 200..219): axis 4
    for i in range(180):
        v = [0.0] * dim
        v[0] = 10.0
        v[1] = float(i % 7)  # in-topic variation, cosine stays ~1 to axis 0
        rows.append((i, v))
    for i in range(200, 220):
        v = [0.0] * dim
        v[4] = 10.0
        v[5] = float(i % 5)
        rows.append((i, v))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    cents = train_centroids(emb, n_cells=2, iters=4, round_decimals=6)
    out = cluster_balanced_sample(emb, cents, total_rows=40, alpha=0.0)
    got = out.collect()
    assert len(got) == 40
    by_cell = {}
    for r in got:
        by_cell.setdefault(r["cell"], set()).add(r["vec_id"])
    # equal share per cluster: 20 from the 180-doc topic, all 20 of the
    # small one (without balancing, proportional draw would take 36/4)
    assert sorted(len(v) for v in by_cell.values()) == [20, 20]
    small_topic = {i for i in range(200, 220)}
    assert small_topic in [set(v) for v in by_cell.values()]
    # deterministic: the same draw twice is byte-identical
    again = {r["vec_id"] for r in cluster_balanced_sample(
        emb, cents, total_rows=40, alpha=0.0).collect()}
    assert again == {r["vec_id"] for r in got}
    # alpha=1 is proportional: the big topic dominates again
    prop = cluster_balanced_sample(emb, cents, total_rows=40, alpha=1.0)
    counts = sorted(
        r["n"] for r in prop.groupBy("cell").agg(F.count("*").alias("n")).collect()
    )
    assert counts == [4, 36]


def test_text_only_balance_composition(spark):
    """Raw text → hashed embeddings → trained cells → balanced draw: the
    full topic-balancing composition with NO embedding model (the
    text-only path test_embedding.py pins for SemDeDup, applied to the
    mixture step). The contract under test is the OPERATOR's: every
    trained cell contributes an equal alpha=0 share, deterministically —
    which topics the quantizer separates is the quantizer's own
    (elsewhere-tested) concern, and md5-ordered init over a 12:1 skew
    may legitimately place both centroids in the big topic."""
    from vmware_sd_wan_velocloud_bi_intake_spark.operators.embedding import (
        hashed_doc_embedding,
    )
    from vmware_sd_wan_velocloud_bi_intake_spark.operators.sampling import (
        cluster_balanced_sample,
    )
    from vmware_sd_wan_velocloud_bi_intake_spark.operators.similarity import (
        train_centroids,
    )

    cooking = "simmer the broth then fold in diced onions and braise gently"
    engines = "torque converter slips when the turbine stator locks up"
    rows = [(i, f"{cooking} variation {i % 5}") for i in range(120)]
    rows += [(1000 + i, f"{engines} case {i % 3}") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    emb = hashed_doc_embedding(docs)
    cents = train_centroids(emb, n_cells=2, iters=4, round_decimals=6)
    out = cluster_balanced_sample(emb, cents, total_rows=16, alpha=0.0)
    got = out.collect()
    assert len(got) == 16
    by_cell = {}
    for r in got:
        by_cell.setdefault(r["cell"], []).append(r["vec_id"])
    # equal alpha=0 share per trained cell (both cells hold >8 docs here,
    # so no capacity redistribution muddies the split)
    assert sorted(len(v) for v in by_cell.values()) == [8, 8], by_cell
    again = {r["vec_id"] for r in cluster_balanced_sample(
        emb, cents, total_rows=16, alpha=0.0).collect()}
    assert again == {r["vec_id"] for r in got}
