"""Distributed logistic-regression quality classifier
(operators/classifier.py).

The GD loop is quantized (gradients and weights round at every step), so a
numpy replay from the same feature matrix must reproduce the weights
BIT-EXACTLY — that is the determinism contract that makes the trainer
engine-replayable. Learning itself is checked on a separable synthetic
set, and the provenance-labeled wrapper end-to-end on fixture documents.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.operators import classifier
from vmware_sd_wan_velocloud_bi_intake_spark.operators.similarity import (
    spark_round_array,
)
from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table


def _replay_gd(X, y, iters, lr, rd=9):
    w = np.zeros(X.shape[1] + 1)
    for _ in range(iters):
        z = X @ w[:-1] + w[-1]
        r = 1.0 / (1.0 + np.exp(-z)) - y
        g = np.concatenate([(r[:, None] * X).mean(axis=0), [r.mean()]])
        g = spark_round_array(g, rd)
        w = spark_round_array(w - lr * g, rd)
    return w


@pytest.fixture(scope="module")
def feat(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    df = docs.select(
        classifier.text_features(F.col("text")).alias("features"),
        (F.col("source") == "src0").cast("int").alias("label"),
    ).cache()
    df.count()
    yield df
    df.unpersist()


def test_gd_matches_numpy_replay_bit_exactly(spark, feat):
    # small_n_cap=0 pins the DISTRIBUTED loop to the replay; the driver
    # arm is pinned to the distributed one in test_small_n_arm below
    w, b = classifier.train_logreg(feat, iters=8, lr=2.0, small_n_cap=0)
    pdf = feat.toPandas()
    X = np.stack(pdf["features"].to_numpy())
    y = pdf["label"].to_numpy(dtype="float64")
    ref = _replay_gd(X, y, iters=8, lr=2.0)
    assert w == [float(v) for v in ref[:-1]]
    assert b == float(ref[-1])


def test_small_n_arm_matches_distributed(spark, feat):
    """r13 adaptive arm: driver-side GD (default — the fixture sits far
    under SMALL_TRAIN_CAP) and the forced distributed loop
    (small_n_cap=0) must produce bit-identical weights: both round
    gradient and update through spark_round_array each step, so each
    step depends only on rounded values and accumulation-order ulps
    stay below the quantum. Checked at the vehicle's rd=6 and the
    default rd=9, plus non-fixture random features."""
    for rd in (6, 9):
        a = classifier.train_logreg(feat, iters=8, lr=2.0, round_decimals=rd)
        b = classifier.train_logreg(
            feat, iters=8, lr=2.0, round_decimals=rd, small_n_cap=0
        )
        assert a == b
    rng = np.random.RandomState(3)
    X = rng.normal(size=(700, 3))
    y = (X[:, 0] - X[:, 2] > 0.2).astype("int64")
    df = spark.createDataFrame(
        [([float(v) for v in row], int(t)) for row, t in zip(X, y)],
        "features array<double>, label int",
    )
    assert classifier.train_logreg(df, iters=10, lr=1.5) == classifier.train_logreg(
        df, iters=10, lr=1.5, small_n_cap=0
    )


def test_learns_separable_plane(spark):
    rng = np.random.RandomState(0)
    X = rng.normal(size=(400, 2))
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype("int64")
    df = spark.createDataFrame(
        [([float(a), float(b)], int(t)) for (a, b), t in zip(X, y)],
        "features array<double>, label int",
    )
    w, b = classifier.train_logreg(df, iters=40, lr=2.0)
    scored = classifier.score_logreg(df, w, b)
    acc = (
        scored.select(
            ((F.col("p_quality") > 0.5).cast("int") == F.col("label"))
            .cast("int")
            .alias("ok")
        )
        .agg(F.avg("ok"))
        .head()[0]
    )
    assert acc >= 0.95
    # the learned direction matches the generating plane (w1 > 0, w2 > 0,
    # ratio near 2:1)
    assert w[0] > 0 and w[1] > 0
    assert 1.2 < w[0] / w[1] < 3.5


def test_provenance_classifier_end_to_end(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    w, b = classifier.train_quality_classifier(
        docs, positive_sources={"src0", "src1"}, iters=4
    )
    assert len(w) == classifier.N_FEATURES
    scored = classifier.score_quality(docs, w, b)
    stats = scored.agg(
        F.min("p_quality"), F.max("p_quality"), F.count("*")
    ).head()
    assert 0.0 < stats[0] and stats[1] < 1.0
    assert stats[2] == docs.count()


def test_scoring_is_narrow(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    scored = classifier.score_quality(docs, [0.1] * classifier.N_FEATURES, 0.0)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "pythonUDF" not in plan.lower()


def test_logreg_artifact_roundtrip(spark, tmp_path):
    from vmware_sd_wan_velocloud_bi_intake_spark.operators import classifier

    p = str(tmp_path / "m" / "quality.json")
    classifier.save_logreg([0.1, -0.25, 3.5], -1.75, p)
    w, b = classifier.load_logreg(p)
    assert w == [0.1, -0.25, 3.5] and b == -1.75
