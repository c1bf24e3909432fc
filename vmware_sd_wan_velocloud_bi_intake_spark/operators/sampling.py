"""Deterministic stratified sampling — the dataset-mixture step of a
training-data pipeline (cap each source/language/label stratum, or take an
exact per-stratum fraction) without ``random()``.

Beyond-reference surface (same discipline as the O4 hash-bucket sample the
reference's probabilistic refresh became): order inside each stratum by
``md5(id)`` — a deterministic pseudo-random permutation, stable across
runs, engines, and cluster layouts — then keep by rank. Ranking is one
window per stratum key: a single shuffle, no driver state, no RNG seeds to
ship. At 100 TB the stratum key is the partition key; skewed strata behave
like any other window (AQE/salting applies as usual).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _rank_in_stratum(df: DataFrame, stratum: str, id_col: str) -> DataFrame:
    w = Window.partitionBy(stratum).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return df.withColumn("__rk", F.row_number().over(w))


def stratified_cap(
    df: DataFrame, stratum: str, id_col: str, cap: int
) -> DataFrame:
    """Keep at most ``cap`` rows per stratum (deterministic md5 order).

    The balancing shape: a dominant source/language stops drowning the
    mixture; strata smaller than the cap pass through whole.
    """
    return _rank_in_stratum(df, stratum, id_col).where(
        F.col("__rk") <= cap
    ).drop("__rk")


def stratified_fraction(
    df: DataFrame, stratum: str, id_col: str, fraction: float
) -> DataFrame:
    """Keep an EXACT per-stratum fraction: ⌈n_stratum · fraction⌉ rows.

    Unlike ``df.sample`` (Bernoulli, per-run variance, non-reproducible
    across layouts) the kept set is exact and deterministic. Costs one
    extra windowed count over the same partitioning (no second shuffle).
    """
    ranked = _rank_in_stratum(df, stratum, id_col)
    n = F.count("*").over(Window.partitionBy(stratum))
    # epsilon guard: n·fraction computed in doubles can land a hair ABOVE an
    # exact integer (100 × 0.07 = 7.000000000000001), and ceil would then
    # keep one row too many. The slack must scale WITH the product: double
    # rounding error is ~ulp(x) ≈ 2.2e-16·x, so a fixed 1e-9 stops covering
    # strata past ~1e7·fraction rows (exactly the 100 TB regime), while
    # 1e-12·x always sits between the ulp noise and any true fractional part
    x = F.col("__n") * F.lit(fraction)
    return (
        ranked.withColumn("__n", n)
        .where(F.col("__rk") <= F.ceil(x - F.abs(x) * F.lit(1e-12)))
        .drop("__rk", "__n")
    )


def temperature_mixture(
    df: DataFrame,
    stratum: str,
    id_col: str,
    total_rows: int,
    alpha: float = 0.7,
) -> DataFrame:
    """Temperature-weighted mixture: stratum ``s`` contributes
    ``total_rows · n_s^α / Σ n_j^α`` rows (the multilingual-pretraining
    upweighting rule — α=1 is proportional sampling, α=0 gives every
    stratum equal share, in-between lifts the tail without drowning the
    head). Sampling is WITHOUT replacement: a stratum's share is capped
    at its size, and the shortfall redistributes across the remaining
    strata (largest fractional remainder first, deterministic ties), so
    exactly ``total_rows`` rows return unless EVERY stratum is exhausted
    — never silent duplicate re-sampling.

    The per-stratum counts visit the driver to compute the α-weights —
    bounded by the number of strata (sources/languages: tens, not rows),
    same contract as the IVF centroid table. Row selection reuses the
    deterministic md5-rank machinery; the caps ride a broadcast join.
    """
    if total_rows <= 0:
        raise ValueError("total_rows must be positive")
    counts = df.groupBy(stratum).agg(F.count("*").alias("n")).collect()
    if not counts:
        return df.limit(0)
    weights = {r[stratum]: float(r["n"]) ** alpha for r in counts}
    z = sum(weights.values())
    # largest-remainder apportionment: independent per-stratum rounding
    # drifts from total_rows (three equal thirds of 10 would round to 3+3+3)
    # and rounds small shares to zero; floors + remainder distribution hits
    # the total exactly whenever capacity allows, deterministically
    # (remainder desc, then stratum value for ties)
    sizes = {r[stratum]: int(r["n"]) for r in counts}
    targets = {k: total_rows * w / z for k, w in weights.items()}
    caps_map = {k: min(sizes[k], int(targets[k])) for k in targets}
    leftover = total_rows - sum(caps_map.values())
    order = sorted(
        targets,
        key=lambda k: (-(targets[k] - int(targets[k])), str(k)),
    )
    while leftover > 0:
        progressed = False
        for k in order:
            if leftover == 0:
                break
            if caps_map[k] < sizes[k]:
                caps_map[k] += 1
                leftover -= 1
                progressed = True
        if not progressed:
            break  # every stratum exhausted — documented shortfall
    caps = list(caps_map.items())
    spark = df.sparkSession
    caps_df = spark.createDataFrame(
        [(k, int(c)) for k, c in caps], [stratum, "__cap"]
    )
    ranked = _rank_in_stratum(df, stratum, id_col)
    return (
        ranked.join(F.broadcast(caps_df), stratum)
        .where(F.col("__rk") <= F.col("__cap"))
        .drop("__rk", "__cap")
    )
