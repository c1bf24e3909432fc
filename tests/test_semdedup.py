"""Semantic dedup (operators/similarity.semantic_dedup_survivors).

SemDeDup (Abbas et al. 2023): cluster, then inside each cluster drop the
closer-to-centroid member of every pair with cosine >= tau. Verified three
ways: a hand-built fixture with known duplicate groups, an independent
numpy replay on the fixture embeddings, and the plan invariants (no
cartesian product, loser stage is the in-array pair form).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.operators import similarity
from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table


def _mk_emb(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_known_duplicate_groups(spark):
    # two tight bundles along axes e0 and e1, plus two isolated vectors;
    # centroids are trained on the data so each bundle maps to one cell
    vecs = [
        [1.0, 0.0, 0.0, 0.0],      # 0: bundle A (exactly on axis)
        [0.999, 0.01, 0.0, 0.0],   # 1: bundle A, slightly off-axis
        [0.998, 0.02, 0.0, 0.0],   # 2: bundle A, further off-axis
        [0.0, 1.0, 0.0, 0.0],      # 3: bundle B
        [0.01, 0.999, 0.0, 0.0],   # 4: bundle B
        [0.0, 0.0, 1.0, 0.0],      # 5: isolated
        [0.0, 0.0, 0.0, 1.0],      # 6: isolated
    ]
    emb = _mk_emb(spark, vecs)
    # explicit axis-aligned centroids: one cell per bundle/isolate,
    # independent of the k-means trajectory on a 7-point toy set
    cents = spark.createDataFrame(
        [
            (c, [1.0 if d == c else 0.0 for d in range(4)], 1.0)
            for c in range(4)
        ],
        "cell long, cv array<double>, cnrm double",
    )
    out = similarity.semantic_dedup_survivors(emb, threshold=0.99, cents=cents)
    survivors = {r["vec_id"] for r in out.collect()}
    # bundle members pair above 0.99 within their cell: exactly one
    # survivor per bundle (the member FARTHEST from its centroid — the
    # keep-the-outlier rule: 2 not 0/1, 4 not 3), isolated vectors survive
    assert survivors == {2, 4, 5, 6}


def test_threshold_one_keeps_everything(spark):
    vecs = np.random.RandomState(7).normal(size=(20, 8))
    emb = _mk_emb(spark, vecs)
    out = similarity.semantic_dedup_survivors(
        emb, threshold=1.0000001, n_cells=4, train_iters=2
    )
    assert out.count() == 20


def test_matches_numpy_replay(spark, sf_smoke):
    """Independent replay: assign-to-argmax-cosine cells with the SAME
    trained centroids, then the same pair rule in pure numpy."""
    emb = load_table(spark, sf_smoke, "embeddings")
    tau = 0.4
    cents = similarity.train_centroids(emb, 8, iters=3, round_decimals=6)
    out = similarity.semantic_dedup_survivors(
        emb, threshold=tau, round_decimals=6, cents=cents
    )
    got = {r["vec_id"] for r in out.collect()}

    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    X = np.stack(pdf["embedding"].to_numpy()).astype("float64")
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cp = cents.toPandas().sort_values("cell")
    C = np.stack(cp["cv"].to_numpy())
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    ccos = np.round(Xn @ Cn.T, 6)
    cell = np.argmax(ccos, axis=1)  # first max = lowest cell, as max_by
    best = ccos[np.arange(len(ids)), cell]
    losers = set()
    for c in np.unique(cell):
        idx = np.flatnonzero(cell == c)
        # sort by (ccos, vec_id) ascending — earlier members win
        order = idx[np.lexsort((ids[idx], best[idx]))]
        sims = np.round(Xn[order] @ Xn[order].T, 6)
        for j in range(len(order)):
            if (sims[:j, j] >= tau).any():
                losers.add(int(ids[order[j]]))
    expected = set(int(i) for i in ids) - losers
    assert got == expected


def test_no_cartesian_in_plan(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    out = similarity.semantic_dedup_survivors(emb, threshold=0.4, n_cells=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the broadcast n x n_cells centroid-assignment NLJ is deliberate (the
    # sim_ann_ivf shape, map-side max_by reduces before the exchange); a
    # true cartesian pair expansion would be a bug
    assert "CartesianProduct" not in plan


def test_incremental_matches_full_cross_pairs(spark, sf_smoke):
    """With the SAME centroids, the incremental probe finds exactly the
    (corpus, batch) cross pairs a full joint run would: assignment is a
    pure function of (vector, cents), so probing the persisted index is
    equivalent to re-clustering corpus+batch together and keeping the
    cross-cell pairs."""
    emb = load_table(spark, sf_smoke, "embeddings")
    corpus = emb.where(F.col("vec_id") % 5 != 0)
    batch = emb.where(F.col("vec_id") % 5 == 0)
    tau = 0.4
    cents = similarity.train_centroids(corpus, 8, iters=3, round_decimals=6)
    # index members assigned against the SAME trained cents the probe uses
    base = corpus.select(
        F.col("vec_id").alias("vid"),
        similarity.as_double_array(F.col("embedding")).alias("v"),
    ).withColumn("nrm", similarity.l2_norm(F.col("v")))
    members = similarity._assign_cells(base, cents, round_decimals=6)
    got = {
        (r["batch_id"], r["corpus_id"])
        for r in similarity.semantic_dedup_incremental(
            batch, cents, members, threshold=tau
        ).collect()
    }

    # numpy replay of the joint clustering, restricted to cross pairs
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    X = np.stack(pdf["embedding"].to_numpy()).astype("float64")
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cp = cents.toPandas().sort_values("cell")
    C = np.stack(cp["cv"].to_numpy())
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    cell = np.argmax(np.round(Xn @ Cn.T, 6), axis=1)
    sims = np.round(Xn @ Xn.T, 6)
    expected = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if (
                ids[i] % 5 == 0
                and ids[j] % 5 != 0
                and cell[i] == cell[j]
                and sims[i, j] >= tau
            ):
                expected.add((int(ids[i]), int(ids[j])))
    assert got == expected
