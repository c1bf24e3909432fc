"""Product quantization (PQ) for embedding search — the IVF-PQ scale path.

At 100 TB a float corpus is the ANN bottleneck: 64 × float32 per vector is
256 bytes that must live in the index and cross every probe's shuffle. PQ
stores ``m`` one-byte codes instead (32× smaller at m=8): split each
(normalized) vector into ``m`` subvectors, k-means a ``ksub``-entry codebook
per subspace, and encode each subvector as its nearest code. Queries score
candidates with ADC (asymmetric distance computation): one ``m × ksub``
lookup table of exact query-to-code dot products per query, then each
member's approximate cosine is ``m`` table lookups — no per-member float
math at all.

Division of labor (the faiss discipline, same as operators/similarity.py):
- **Training** is driver-side numpy on a bounded deterministic sample
  (md5-ordered head, ``sample_rows`` cap) — codebooks are ``m·ksub·dsub``
  doubles, broadcast as literals.
- **Encoding and scoring** are pure JVM expressions that fuse into the
  scan: the codebook is a constant-folded literal array, the argmin and the
  LUT sum are higher-order folds whose lambdas touch only their arguments
  (see the lambda-capture guard in tests/test_lambda_capture_guard.py).
- **Search** composes with the IVF index from operators/similarity.py:
  probe ``nprobe`` cells, ADC-score only those cells' members, optionally
  exact-rerank the top ``refine`` ADC candidates against the full vectors
  (touching refine × |queries| float rows, not the corpus).

No reference analog (beyond-reference LLM-pipeline surface).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .similarity import as_double_array, dot, l2_norm


def train_pq_codebooks(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 16,
    vec_id: str = "vec_id",
    embedding: str = "embedding",
    iters: int = 10,
    sample_rows: int = 16384,
) -> list[list[list[float]]]:
    """Per-subspace k-means codebooks from a bounded deterministic sample.

    Vectors are L2-normalized before splitting (spherical corpus contract —
    ADC dot sums then approximate cosine). Returns ``m`` codebooks of
    ``ksub`` centroids of ``d/m`` doubles. Deterministic: md5-ordered
    sample, first-``ksub`` init, first-minimum ties (np.argmin).
    """
    import numpy as np

    pdf = (
        emb.select(
            F.col(vec_id).alias("vid"),
            as_double_array(F.col(embedding)).alias("v"),
        )
        .orderBy(F.md5(F.col("vid").cast("string")), F.col("vid"))
        .limit(sample_rows)
        .toPandas()
    )
    X = np.stack(pdf["v"].to_numpy())
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    dsub = d // m
    books: list[list[list[float]]] = []
    for s in range(m):
        S = X[:, s * dsub : (s + 1) * dsub]
        k = min(ksub, len(S))
        C = S[:k].copy()
        for _ in range(iters):
            # L2 assignment; np.argmin keeps the FIRST minimum on ties —
            # the expression encoder reproduces exactly this rule
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
                # empty codes keep their previous centroid
        books.append([[float(x) for x in row] for row in C])
    return books


def codebook_column(codebooks: list[list[list[float]]]) -> Column:
    """The codebooks as one constant-folded literal: array m × ksub × dsub."""
    return F.array(
        *[
            F.array(*[F.array(*[F.lit(x) for x in code]) for code in book])
            for book in codebooks
        ]
    )


def _subvectors(v: Column, m: int, dsub: int) -> Column:
    """Split an array<double> into m equal slices (array of subvectors)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.slice(v, s * dsub + 1, dsub),
    )


def _normalized(v: Column) -> Column:
    n = l2_norm(v)
    safe = F.when(n == 0, F.lit(1.0)).otherwise(n)
    return F.transform(v, lambda x: x / safe)


def _d2(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode_expr(v: Column, codebooks: list[list[list[float]]]) -> Column:
    """array<int> of per-subspace nearest-code ids for a (raw) vector.

    Normalizes, splits, then per subspace folds over the literal codebook
    tracking (next_j, best_j, best_d); strict ``<`` keeps the first minimum
    (np.argmin tie rule). Lambdas reference only bound lambda variables —
    no captured row expressions re-evaluate per element.
    """
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    subs = _subvectors(_normalized(v), m, dsub)
    return F.zip_with(
        subs,
        codebook_column(codebooks),
        lambda sub, book: F.aggregate(
            book,
            F.struct(
                F.lit(0).alias("j"),
                F.lit(-1).alias("best_j"),
                F.lit(float("inf")).alias("best_d"),
            ),
            lambda acc, code: F.struct(
                (acc["j"] + 1).alias("j"),
                F.when(_d2(sub, code) < acc["best_d"], acc["j"])
                .otherwise(acc["best_j"])
                .alias("best_j"),
                F.least(_d2(sub, code), acc["best_d"]).alias("best_d"),
            ),
            lambda acc: acc["best_j"],
        ),
    )


def pq_lut_expr(qv: Column, codebooks: list[list[list[float]]]) -> Column:
    """Per-query ADC lookup table: array m × ksub of ⟨q_sub, code⟩ dots.

    Built once per query row (m·ksub·dsub multiplies), amortized over every
    candidate that query scores.
    """
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    subs = _subvectors(_normalized(qv), m, dsub)
    return F.zip_with(
        subs,
        codebook_column(codebooks),
        lambda sub, book: F.transform(book, lambda code: dot(sub, code)),
    )


def pq_score_expr(codes: Column, lut: Column) -> Column:
    """Approximate cosine: Σ_m lut[m][codes[m]] — pure table lookups."""
    return F.aggregate(
        F.zip_with(codes, lut, lambda c, row: F.element_at(row, c + 1)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ivf_pq_index(
    emb: DataFrame,
    n_cells: int | None = None,
    m: int = 8,
    ksub: int = 16,
    vec_id: str = "vec_id",
    embedding: str = "embedding",
    train_iters: int = 10,
) -> tuple[DataFrame, DataFrame, list[list[list[float]]]]:
    """Build (centroids, pq_members, codebooks).

    pq_members = (cell, vid, codes, nrm) — ``m`` small ints + the original
    norm per vector instead of the float payload; write it bucketed on
    ``cell`` like the float IVF index. Cell assignment uses the trained
    spherical-k-means coarse quantizer from operators/similarity.
    """
    from .similarity import _assign_cells, train_centroids

    base = emb.select(
        F.col(vec_id).alias("vid"),
        as_double_array(F.col(embedding)).alias("v"),
    ).withColumn("nrm", l2_norm(F.col("v")))
    if n_cells is None:
        base.persist()
        n_cells = max(8, math.ceil(math.sqrt(base.count())))
    cents = train_centroids(
        emb, n_cells, vec_id=vec_id, embedding=embedding, iters=train_iters
    )
    books = train_pq_codebooks(
        emb, m=m, ksub=ksub, vec_id=vec_id, embedding=embedding,
        iters=train_iters,
    )
    members = _assign_cells(base, cents).select(
        "cell", "vid", pq_encode_expr(F.col("v"), books).alias("codes"), "nrm"
    )
    return cents, members, books


def ann_ivf_pq_topk(
    queries: DataFrame,
    centroids: DataFrame,
    pq_members: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 3,
    nprobe: int = 1,
    refine: int | None = None,
    members: DataFrame | None = None,
    vec_id: str = "vec_id",
    embedding: str = "embedding",
) -> DataFrame:
    """IVF-PQ search: probe cells, ADC-score codes, optional exact rerank.

    Returns (query_id, neighbor_id, score, rk) where ``score`` is the ADC
    approximate cosine — or the exact cosine when ``refine`` is set (the
    top ``refine`` ADC candidates per query re-scored against the float
    vectors in ``members`` (vid, v, nrm); refine ≥ k required).

    Shuffle shape: centroid broadcast → nprobe cells per query; the member
    join is keyed by cell (bucketed members ⇒ no corpus-side exchange);
    candidate rows carry ``m`` ints, not d floats, so the probe shuffle is
    ~32× lighter than float IVF at m=8 — the reason PQ is the 100 TB form.
    """
    if refine is not None:
        if members is None:
            raise ValueError("refine requires the float members relation")
        if refine < k:
            raise ValueError(f"refine={refine} must be >= k={k}")
    q = queries.select(
        F.col(vec_id).alias("query_id"),
        as_double_array(F.col(embedding)).alias("qv"),
    ).withColumn("qnrm", l2_norm(F.col("qv")))
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("cell_cos").desc(), F.col("cell")
    )
    probed = (
        q.join(F.broadcast(centroids))
        .withColumn(
            "cell_cos",
            dot(F.col("qv"), F.col("cv")) / (F.col("qnrm") * F.col("cnrm")),
        )
        .withColumn("prn", F.row_number().over(probe_w))
        .where(F.col("prn") <= nprobe)
        .select(
            "query_id",
            "qv",
            pq_lut_expr(F.col("qv"), codebooks).alias("lut"),
            "cell",
        )
    )
    scored = (
        probed.join(pq_members, "cell")
        .where(F.col("query_id") != F.col("vid"))
        .select(
            "query_id",
            "qv",
            F.col("vid").alias("neighbor_id"),
            pq_score_expr(F.col("codes"), F.col("lut")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    limit = refine if refine is not None else k
    top = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= limit)
    )
    if refine is None:
        return top.select("query_id", "neighbor_id", "score", "rk")
    exact = top.join(
        members.select(F.col("vid").alias("neighbor_id"), "v", "nrm"),
        "neighbor_id",
    ).select(
        "query_id",
        "neighbor_id",
        (
            dot(F.col("qv"), F.col("v"))
            / (F.greatest(l2_norm(F.col("qv")), F.lit(1e-12)) * F.col("nrm"))
        ).alias("score"),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        exact.withColumn("rk", F.row_number().over(w2))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "score", "rk")
    )
