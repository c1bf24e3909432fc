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
from pyspark.sql import types as T


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
    sizes = {r[stratum]: int(r["n"]) for r in counts}
    caps_map = _apportion(weights, sizes, total_rows)
    spark = df.sparkSession
    # explicit schema from the input (a plain column list would re-infer
    # types and CRASH on an all-NULL stratum key)
    caps_schema = T.StructType(
        [
            df.schema[stratum],
            T.StructField("__cap", T.LongType(), False),
        ]
    )
    caps_df = spark.createDataFrame(
        [(k, int(c)) for k, c in caps_map.items()], caps_schema
    ).withColumnRenamed(stratum, "__stratum_key")
    ranked = _rank_in_stratum(df, stratum, id_col)
    return (
        ranked.join(
            F.broadcast(caps_df),
            # NULL is a real stratum: groupBy counted it and the caps
            # allocated to it, so the join must match it too — a plain
            # equi-join would silently drop every NULL-stratum row and
            # break the exactly-total_rows contract
            F.col(stratum).eqNullSafe(F.col("__stratum_key")),
        )
        .where(F.col("__rk") <= F.col("__cap"))
        .drop("__rk", "__cap", "__stratum_key")
    )


def _apportion(
    weights: dict, sizes: dict, total: int
) -> dict:
    """Capacity-capped proportional apportionment with largest remainder.

    Iterative: each round distributes the outstanding total across the
    still-open strata proportionally to their weights (floors + largest
    fractional remainder, ties broken by stratum repr — deterministic),
    capped at capacity. A round either places everything or exhausts at
    least one stratum, so the loop runs at most |strata| rounds of pure
    arithmetic — never one Python iteration per allocated ROW (an early
    form did +1 per row per pass: O(total) driver time at 1e8 rows).
    Shortfall remains only when every stratum is exhausted.
    """
    caps = {k: 0 for k in weights}
    remaining = total
    while remaining > 0:
        open_ = [k for k in weights if caps[k] < sizes[k]]
        if not open_:
            break
        z = sum(weights[k] for k in open_)
        shares = {
            k: (remaining * weights[k] / z if z > 0 else remaining / len(open_))
            for k in open_
        }
        floors = {k: min(sizes[k] - caps[k], int(shares[k])) for k in open_}
        for k in open_:
            caps[k] += floors[k]
        placed = sum(floors.values())
        frac_order = sorted(
            open_,
            key=lambda k: (-(shares[k] - int(shares[k])), str(k)),
        )
        for k in frac_order:
            if placed >= remaining:
                break
            if caps[k] < sizes[k]:
                caps[k] += 1
                placed += 1
        if placed == 0:
            break  # open strata exist but nothing placeable this round
        remaining -= placed
    return caps


def cluster_balanced_sample(
    emb: DataFrame,
    cents: DataFrame,
    total_rows: int,
    alpha: float = 0.0,
    vec_id: str = "vec_id",
    embedding: str = "embedding",
    round_decimals: int | None = 6,
) -> DataFrame:
    """Topic-balanced resampling over an embedding space — the
    cluster-proportional curation step (the data-mixture half of the
    SemDeDup-style pipeline): assign every vector to its cell at a
    TRAINED coarse quantizer (``similarity.train_centroids`` — the same
    build-once artifact the ANN index and semantic dedup share), then
    draw a temperature-weighted mixture across cells.

    ``alpha`` has the :func:`temperature_mixture` semantics at cell
    grain: 0 gives every topic cluster an equal share of ``total_rows``
    (maximum balance — a dominant topic stops drowning the mixture),
    1 is proportional (no rebalancing), in between lifts tail topics.
    Selection within a cell is the deterministic md5-rank permutation;
    the whole draw is reproducible across runs, engines, and layouts.

    Scale: one broadcast cell assignment (map-only, O(n × n_cells)) +
    the mixture's single window shuffle on the cell key; the per-cell
    counts that size the apportionment visit the driver bounded by
    n_cells (the IVF centroid-table contract), never by rows.

    Returns the sampled rows with their ``cell`` so downstream stages
    (packing, splits) can stratify on it; drop it if not wanted.
    """
    from . import similarity

    cells = similarity.ivf_members(
        emb,
        cents,
        vec_id=vec_id,
        embedding=embedding,
        round_decimals=round_decimals,
    ).select(F.col("vid").alias(vec_id), "cell")
    with_cell = emb.join(cells, vec_id)
    return temperature_mixture(
        with_cell, "cell", vec_id, total_rows, alpha=alpha
    )
