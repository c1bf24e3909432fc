"""Distributed text-quality classifier: logistic regression trained with
full-batch gradient descent, every iteration ONE global aggregation.

The CCNet/GPT-3 quality-filter recipe re-expressed Spark-first: label a
seed set by provenance (curated sources = positive, random crawl =
negative), featurize every document with cheap scale-free text statistics
(pure expressions from ``operators/text.py``), fit a linear model, score
the whole corpus, keep documents above a threshold.

Scale shape:
- featurization is narrow (rides the scan);
- each GD iteration aggregates the full corpus into d+1 partial means —
  map-side combine, ONE 1-row result to the driver (the Lloyd-training
  pattern: the d+2 scalars must materialize anyway to seed the next
  iteration's expression);
- scoring is a pure expression over the broadcast-by-literal weights —
  zero shuffles, zero Python.

Determinism: gradients round to ``round_decimals`` before they leave
Spark, and the driver-side weight update rounds with the same rule
(``similarity.spark_round_array``), so training is a deterministic
function of the input bytes — replayable step-for-step by any engine
(tests/test_classifier.py replays it in numpy and checks bit-equality;
ulp-level accumulation differences sit below the rounding quantum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import text
from .similarity import spark_round_array

N_FEATURES = 5

# Full-batch-GD small-input arm (r13): feature tables at or under this
# row count train driver-side (see train_logreg). A row is d doubles +
# a label (~50 bytes at d=5), so the capped collect is bounded at tens
# of MB; the distributed loop at this size is pure per-iteration driver
# floor (~0.25 s/aggregation job on the bench box) for a gradient one
# numpy pass computes in microseconds.
SMALL_TRAIN_CAP = 262_144


def text_features(t: Column) -> Column:
    """Bounded, scale-free per-document feature vector (pure expression).

    [log1p(tokens)/10, punct density, stopword ratio, duplicate-token
    fraction, mean token length/10] — each O(1) magnitude so unscaled GD
    converges.
    """
    n_chars = F.greatest(text.char_count(t), F.lit(1)).cast("double")
    n_toks = F.greatest(text.token_count(t), F.lit(1)).cast("double")
    return F.array(
        F.log1p(text.token_count(t).cast("double")) / F.lit(10.0),
        text.punct_count(t).cast("double") / n_chars,
        text.stopword_ratio(t),
        text.dup_token_fraction(t),
        (F.length(F.regexp_replace(t, r"\s+", "")).cast("double") / n_toks)
        / F.lit(10.0),
    )


def sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def _dot_lit(x: Column, w: list[float], b: float) -> Column:
    wlit = F.array(*[F.lit(float(v)) for v in w])
    return F.aggregate(
        F.zip_with(x, wlit, lambda a, c: a * c),
        F.lit(float(b)),
        lambda acc, v: acc + v,
    )


def train_logreg(
    df: DataFrame,
    features_col: str = "features",
    label_col: str = "label",
    iters: int = 16,
    lr: float = 2.0,
    round_decimals: int = 9,
    cache: bool = True,
    loop_partitions: int | str | None = "auto",
    small_n_cap: int = SMALL_TRAIN_CAP,
) -> tuple[list[float], float]:
    """Full-batch GD. Returns (weights, bias).

    **Adaptive small-input arm** (r13): each distributed GD iteration is
    one global-aggregation job whose cost on a small feature table is
    pure driver floor (Py4J + scheduling, ~0.25 s/job on the bench box),
    so ``iters`` steps pay ``iters`` floors for arithmetic one vectorized
    numpy pass performs in microseconds. The input size is probed with a
    capped ``limit(cap+1).toPandas()`` (bounded by construction — the
    ``duplicate_components`` small-graph discipline); when every row fits
    under ``small_n_cap`` the whole GD loop runs driver-side on the
    collected matrix with the IDENTICAL quantized contract — gradients
    and updates round through ``spark_round_array`` (= Spark ``F.round``)
    each step, so both arms depend only on rounded values and agree under
    the same BELOW-THE-QUANTUM contract as partitioning invariance: the
    np.exp / numpy-mean vs JVM Math.exp / partitioned-avg differences are
    ulp-level, ~1e-9 under the ``round_decimals`` quantum, so they cannot
    move a rounded value unless an intermediate lands within ulps of a
    HALF_UP boundary (the same argument that lets the DuckDB oracle
    replay this trainer; asserted cross-arm on the fixture and seeded
    corpora in tests/test_classifier.py — a probabilistic, not absolute,
    guarantee, exactly like the oracle replay itself).
    Above the cap — or with ``small_n_cap=0``, which tests use to force
    it — the distributed loop runs unchanged; featurization and scoring
    stay distributed in both arms.

    ``cache`` persists the two-column (features, label) projection for the
    loop — ``iters`` scans of a narrow cached relation instead of
    re-running the upstream featurization pipeline each round; unpersisted
    on exit. At corpus scales where even the projection cannot cache,
    pass False and accept the re-scan (or point ``df`` at a staged table).

    ``loop_partitions`` (default "auto") applies the loop-parallelism
    rule (functions/conf.py): the cached projection is ~50 bytes/row —
    orders narrower than the documents it came from — yet each GD
    iteration pays the per-task floor across every upstream partition.
    Auto counts the input once (column-pruned: featurization expressions
    are NOT evaluated for the count) and repartitions the projection to
    ``loop_partition_count`` before caching — featurization still runs
    at full upstream parallelism; only the narrow feature rows move.
    The gradient sums' accumulation ORDER changes with partitioning; the
    per-step rounding quantum absorbs that (the same contract that makes
    the trainer engine-replayable), so the trained weights are
    partitioning-invariant at ``round_decimals``. None keeps the
    upstream data partitioning (the scoped loop confs — AQE off,
    shuffle partitions pinned — still apply; pre-r10 the loop ran
    under plain session confs with AQE on); an int is explicit.
    """
    import numpy as np

    from ..functions.conf import iterative_loop_confs, loop_partition_count

    spark = df.sparkSession
    proj = df.select(
        F.col(features_col).alias("x"),
        F.col(label_col).cast("double").alias("y"),
    )
    if small_n_cap:
        pdf = proj.limit(small_n_cap + 1).toPandas()
        if len(pdf) <= small_n_cap:
            if not len(pdf):
                raise ValueError("train_logreg: empty input")
            X = np.stack(pdf["x"].to_numpy())
            y = pdf["y"].to_numpy(dtype="float64")
            d = X.shape[1]
            wb = np.zeros(d + 1)
            for _ in range(iters):
                r = 1.0 / (1.0 + np.exp(-(X @ wb[:d] + wb[d]))) - y
                g = spark_round_array(
                    np.concatenate([(r[:, None] * X).mean(axis=0), [r.mean()]]),
                    round_decimals,
                )
                wb = spark_round_array(wb - lr * g, round_decimals)
            return [float(v) for v in wb[:d]], float(wb[d])
    p = proj.rdd.getNumPartitions()
    if cache and loop_partitions is not None:
        # the repartition amortizes only through the cache: uncached, its
        # shuffle would re-run on EVERY iteration's re-scan and buy
        # nothing — cache=False keeps the upstream partitioning and still
        # gets the scoped loop confs below
        want = (
            loop_partition_count(df.count(), p)
            if loop_partitions == "auto"
            else int(loop_partitions)
        )
        if want < p:
            proj, p = proj.repartition(want), want
    if cache:
        proj = proj.persist()
    try:
        d_row = proj.select(F.size("x").alias("d")).head()
        if d_row is None:
            raise ValueError("train_logreg: empty input")
        d = d_row["d"]
        w, b = [0.0] * d, 0.0
        x = F.col("x")
        with iterative_loop_confs(spark, p):
            for _ in range(iters):
                r = sigmoid(_dot_lit(x, w, b)) - F.col("y")
                aggs = [
                    F.round(
                        F.avg(r * F.element_at(x, j + 1)), round_decimals
                    ).alias(f"g{j}")
                    for j in range(d)
                ] + [F.round(F.avg(r), round_decimals).alias("gb")]
                row = proj.agg(*aggs).head()
                g = np.array([row[f"g{j}"] for j in range(d)] + [row["gb"]])
                upd = spark_round_array(
                    np.array(w + [b]) - lr * g, round_decimals
                )
                w, b = [float(v) for v in upd[:d]], float(upd[d])
    finally:
        if cache:
            proj.unpersist()
    return w, b


def score_logreg(
    df: DataFrame,
    weights: list[float],
    bias: float,
    features_col: str = "features",
    out_col: str = "p_quality",
) -> DataFrame:
    """Pure-expression scoring: sigmoid(w·x + b). No shuffle, no Python."""
    return df.withColumn(
        out_col, sigmoid(_dot_lit(F.col(features_col), weights, bias))
    )


def train_quality_classifier(
    docs: DataFrame,
    positive_sources: set[str],
    doc_id: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    iters: int = 16,
    lr: float = 2.0,
) -> tuple[list[float], float]:
    """Provenance-labeled quality model: documents from ``positive_sources``
    are the positive seed class (the curated-corpus trick)."""
    feat = docs.select(
        text_features(F.col(text_col)).alias("features"),
        F.col(source_col)
        .isin(*sorted(positive_sources))
        .cast("int")
        .alias("label"),
    )
    return train_logreg(feat, iters=iters, lr=lr)


def score_quality(
    docs: DataFrame,
    weights: list[float],
    bias: float,
    doc_id: str = "doc_id",
    text_col: str = "text",
    out_col: str = "p_quality",
) -> DataFrame:
    """Attach the quality probability to every document (narrow)."""
    return docs.withColumn(
        out_col,
        sigmoid(_dot_lit(text_features(F.col(text_col)), weights, bias)),
    )


def save_logreg(weights: list[float], bias: float, path: str) -> None:
    """Persist trained classifier weights as a JSON artifact via the
    shared crash-safe writer (functions/artifacts.py). d+1 floats — the
    whole model is driver-held by design."""
    from ..functions.artifacts import atomic_write_json

    atomic_write_json(
        path,
        {
            "format": "logreg/v1",
            "weights": [float(w) for w in weights],
            "bias": float(bias),
        },
    )


def load_logreg(path: str) -> tuple[list[float], float]:
    """Inverse of :func:`save_logreg`."""
    from ..functions.artifacts import read_json_artifact

    payload = read_json_artifact(path, "logreg/v1")
    return [float(w) for w in payload["weights"]], float(payload["bias"])
