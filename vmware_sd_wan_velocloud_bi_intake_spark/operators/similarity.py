"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN.

Beyond-reference surface (SURVEY.md §7 step 10) over the ``embeddings`` table
(``vec_id bigint, embedding array<float>, label int``).

Scale design:
- **Brute force** is the correctness baseline: an O(n·m) join. For a bounded
  query set vs. a huge corpus the query side is broadcast, so the corpus is
  scanned once with no shuffle; top-k per query via window ranking with
  partial aggregation.
- **Random-hyperplane LSH (SRP)** is the scale path: each vector maps to a
  B-bit signature; candidate pairs share a signature prefix bucket, turning
  the quadratic pair space into Σ bucket². Hyperplanes are derived
  deterministically from md5 of (plane, dim) so signatures are reproducible
  without shipping a random matrix.
- All dot products run as ``zip_with``/``aggregate`` over ``double`` arrays —
  JVM expressions, no Python. float→double upcast is exact, and a fixed
  left-to-right fold order makes results bit-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double_array(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order ⇒ bit-stable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk_pairs(
    emb: DataFrame,
    k: int = 5,
    vec_id: str = "vec_id",
    embedding: str = "embedding",
    queries: DataFrame | None = None,
) -> DataFrame:
    """Top-k nearest neighbors per query vector by cosine similarity.

    Scale shape: the *corpus* (the smaller / bounded side) is collected into a
    dense float64 matrix and broadcast to executors; query partitions stream
    past it with one vectorized BLAS matmul per Arrow batch, emitting exactly
    k rows per query. No pair-space shuffle exists at all — the only shuffle
    in the plan is the query-side scan. At 100 TB of queries this is a single
    map stage; when the corpus is also huge, block it and union the per-block
    top-k (associative), or switch to ``ann_lsh_topk``.

    ``queries`` defaults to the corpus itself (all-pairs kNN, self excluded).
    Returns (query_id, neighbor_id, cos_sim, rk), rk 1-based with
    neighbor_id tiebreak.
    """
    import numpy as np
    import pandas as pd

    corpus_pdf = (
        emb.select(
            F.col(vec_id).alias("neighbor_id"),
            as_double_array(F.col(embedding)).alias("v"),
        )
        .toPandas()
    )
    c_ids = corpus_pdf["neighbor_id"].to_numpy(dtype="int64")
    c_mat = np.stack(corpus_pdf["v"].to_numpy())  # (n, d) float64
    c_norm = np.sqrt((c_mat * c_mat).sum(axis=1))

    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast((c_ids, c_mat, c_norm))
    kk = k

    qside = (queries if queries is not None else emb).select(
        F.col(vec_id).alias("query_id"),
        as_double_array(F.col(embedding)).alias("qv"),
    )

    def topk_blocks(batches):
        ids_b, mat_b, norm_b = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q_ids = pdf["query_id"].to_numpy(dtype="int64")
            q_mat = np.stack(pdf["qv"].to_numpy())
            q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))
            sims = (q_mat @ mat_b.T) / np.outer(q_norm, norm_b)
            out_q, out_n, out_s, out_r = [], [], [], []
            for i in range(len(q_ids)):
                row = sims[i]
                mask = ids_b != q_ids[i]
                cand_ids = ids_b[mask]
                cand_sims = row[mask]
                # primary: cos desc; tiebreak: neighbor_id asc
                order = np.lexsort((cand_ids, -cand_sims))[:kk]
                out_q.extend([q_ids[i]] * len(order))
                out_n.extend(cand_ids[order])
                out_s.extend(cand_sims[order])
                out_r.extend(range(1, len(order) + 1))
            yield pd.DataFrame(
                {
                    "query_id": np.asarray(out_q, dtype="int64"),
                    "neighbor_id": np.asarray(out_n, dtype="int64"),
                    "cos_sim": np.asarray(out_s, dtype="float64"),
                    "rk": np.asarray(out_r, dtype="int32"),
                }
            )

    return qside.mapInPandas(
        topk_blocks,
        schema="query_id long, neighbor_id long, cos_sim double, rk int",
    )


def cosine_topk_pairs_hof(
    emb: DataFrame,
    k: int = 5,
    vec_id: str = "vec_id",
    embedding: str = "embedding",
) -> DataFrame:
    """Expression-only variant of :func:`cosine_topk_pairs` (no Python).

    Bit-stable sequential fold — used to cross-check the vectorized path.
    O(n·m) pair join; correct but not the scale path.
    """
    corpus = emb.select(
        F.col(vec_id).alias("neighbor_id"),
        as_double_array(F.col(embedding)).alias("__emb_b"),
    )
    qside = emb.select(
        F.col(vec_id).alias("query_id"),
        as_double_array(F.col(embedding)).alias("__emb_a"),
    )
    pairs = corpus.join(F.broadcast(qside), F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("__emb_a"), F.col("__emb_b")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


def sign_block_key(embedding: Column, block_dims: int = 6) -> Column:
    """Deterministic ANN blocking key: md5 of the sign pattern of the first
    ``block_dims`` dimensions.

    Unlike SRP (whose hyperplanes are engine-side literals), the sign pattern
    is a pure function of the data — any engine reproduces the same buckets,
    which makes the blocked near-dup join fully oracle-checkable. Vectors
    with high cosine similarity agree on the sign of every high-magnitude
    coordinate, so recall loss concentrates on near-zero coordinates (the
    standard LSH trade-off; more dims → smaller buckets → lower recall).
    """
    bits = [
        F.when(F.element_at(embedding, d + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for d in range(block_dims)
    ]
    return F.md5(F.concat_ws("|", *bits))


def cosine_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    block_dims: int = 6,
    vec_id: str = "vec_id",
    embedding: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via deterministic sign-blocking.

    The 100 TB shape: an equi-join on the block key (never a cross join) —
    pair space is Σ bucket², tuned by ``block_dims``. Candidates get the
    exact sequential-fold cosine; pairs at or above ``threshold`` survive.
    Returns (vec_a, vec_b, cos_sim) with vec_a < vec_b, each pair once.
    """
    v = (
        emb.select(
            F.col(vec_id).alias("vid"),
            as_double_array(F.col(embedding)).alias("v"),
        )
        # hoist the norm: computed once per vector (n folds), not once per
        # pair side (Σ bucket² folds); the cosine keeps the oracle's exact
        # operand order dot/(norm_a·norm_b) so doubles stay bit-identical
        .withColumn("nrm", l2_norm(F.col("v")))
        .withColumn("blk", sign_block_key(F.col("v"), block_dims))
    )
    a = v.select(
        F.col("vid").alias("vec_a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"), "blk",
    )
    b = v.select(
        F.col("vid").alias("vec_b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"), "blk",
    )
    return (
        a.join(b, on="blk")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
                "cos_sim"
            ),
        )
        .where(F.round(F.col("cos_sim"), 6) >= F.lit(threshold))
    )


def ann_ivf_topk(
    emb: DataFrame,
    n_cells: int | None = None,
    k: int = 3,
    vec_id: str = "vec_id",
    embedding: str = "embedding",
) -> DataFrame:
    """IVF-style approximate kNN: coarse quantizer + cell-restricted search.

    Structure of a production IVF index, deterministically:
    1. **Coarse centroids** — here the ``n_cells`` lowest-id vectors (a
       deterministic stand-in for k-means training; the index *structure*,
       not the centroid quality, is what this operator contributes). The
       centroid set is tiny and broadcast.
    2. **Assignment** — every vector joins the broadcast centroids and keeps
       its argmax-cosine cell (ties → lowest centroid id), one map-side pass.
    3. **Probe** — neighbors are ranked by exact cosine *within the cell
       only* (nprobe=1): the pair space is Σ cell², never n².

    ``n_cells`` MUST grow with the corpus — fixed cells make in-cell search
    quadratic in occupancy (measured 25× at 8× data in tools/scale_check.py
    before this default). The default ``max(8, ⌈√n⌉)`` is the standard IVF
    sizing: cell occupancy ≈ √n, total probe cost ≈ n^1.5 / constant.

    At 100 TB: assignment is a broadcast join (no shuffle of the corpus
    beyond the cell groupBy); cells are the partitioning key for the search,
    so the shuffle is keyed and skew-bounded by centroid fan-out.

    Returns (query_id, neighbor_id, cos_sim, rk), rk 1-based within cell.
    """
    import math

    if n_cells is None:
        n_cells = max(8, math.ceil(math.sqrt(emb.count())))
    base = emb.select(
        F.col(vec_id).alias("vid"),
        as_double_array(F.col(embedding)).alias("v"),
    ).withColumn("nrm", l2_norm(F.col("v")))
    cents = base.orderBy("vid").limit(n_cells).select(
        F.col("vid").alias("cell"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    assign_w = Window.partitionBy("vid").orderBy(
        F.col("cell_cos").desc(), F.col("cell")
    )
    assigned = (
        base.join(F.broadcast(cents))
        .withColumn(
            "cell_cos",
            dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm")),
        )
        .withColumn("arn", F.row_number().over(assign_w))
        .where(F.col("arn") == 1)
        .select("vid", "cell")
    )
    groups = (
        assigned.groupBy("cell")
        .agg(F.sort_array(F.collect_set("vid")).alias("ids"))
        .where(F.size("ids") > 1)
    )
    ids = F.col("ids")
    pair_structs = F.flatten(
        F.transform(
            ids,
            lambda x: F.filter(
                F.transform(ids, lambda y: F.struct(x.alias("q"), y.alias("n"))),
                lambda p: p["q"] != p["n"],
            ),
        )
    )
    pairs = groups.select(F.explode(pair_structs).alias("p")).select(
        F.col("p.q").alias("query_id"), F.col("p.n").alias("neighbor_id")
    )
    qa = base.select(
        F.col("vid").alias("query_id"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    nb = base.select(
        F.col("vid").alias("neighbor_id"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    scored = (
        pairs.join(qa, "query_id")
        .join(nb, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


def ivf_index(
    emb: DataFrame,
    n_cells: int | None = None,
    vec_id: str = "vec_id",
    embedding: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Build the persistable IVF index: (centroids, members).

    centroids = (cell, cv, cnrm) — tiny, broadcastable.
    members   = (cell, vid, v, nrm) — the corpus partitioned by cell; write
    it bucketed on ``cell`` (sinks.bucketed) and query batches search it
    without re-assigning the corpus. Same deterministic coarse quantizer as
    :func:`ann_ivf_topk` (n_cells lowest-id vectors, argmax-cosine
    assignment, ties to lowest centroid id).
    """
    import math

    if n_cells is None:
        n_cells = max(8, math.ceil(math.sqrt(emb.count())))
    base = emb.select(
        F.col(vec_id).alias("vid"),
        as_double_array(F.col(embedding)).alias("v"),
    ).withColumn("nrm", l2_norm(F.col("v")))
    cents = base.orderBy("vid").limit(n_cells).select(
        F.col("vid").alias("cell"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    assign_w = Window.partitionBy("vid").orderBy(
        F.col("cell_cos").desc(), F.col("cell")
    )
    members = (
        base.join(F.broadcast(cents))
        .withColumn(
            "cell_cos",
            dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm")),
        )
        .withColumn("arn", F.row_number().over(assign_w))
        .where(F.col("arn") == 1)
        .select("cell", "vid", "v", "nrm")
    )
    return cents, members


def ann_ivf_query(
    queries: DataFrame,
    centroids: DataFrame,
    members: DataFrame,
    k: int = 3,
    nprobe: int = 1,
    vec_id: str = "vec_id",
    embedding: str = "embedding",
) -> DataFrame:
    """Search a query batch against a prebuilt IVF index (incremental form).

    Each query broadcasts against the centroid table, keeps its ``nprobe``
    closest cells, joins the member lists of just those cells, and ranks by
    exact cosine. Cost: |queries| × nprobe × avg-cell-size — independent of
    corpus size beyond cell occupancy; the only shuffle is keyed by cell
    (none on the corpus side if members were written bucketed on cell).
    ``nprobe > 1`` trades compute for recall — the standard IVF knob the
    self-indexing form doesn't expose.

    Returns (query_id, neighbor_id, cos_sim, rk); self-matches (same id)
    are excluded.
    """
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
        .select("query_id", "qv", "qnrm", "cell")
    )
    scored = (
        probed.join(members, "cell")
        .where(F.col("query_id") != F.col("vid"))
        .select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            (dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


def _hyperplane(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane coefficient in [-1, 1).

    Derived from md5(plane:dim) — reproducible everywhere, no RNG state.
    """
    import hashlib

    h = hashlib.md5(f"{plane}:{dim}".encode()).hexdigest()
    return (int(h[:8], 16) / float(0xFFFFFFFF)) * 2.0 - 1.0


def srp_signature(embedding: Column, dims: int, planes: int = 16) -> Column:
    """Signed-random-projection bit signature as a bigint.

    bit_p = 1 iff ⟨v, h_p⟩ ≥ 0 with h_p a fixed pseudo-random hyperplane.
    The plane matrix is generated as literals (constant-folded; no shuffle,
    no broadcast variable needed at this size).
    """
    acc = F.lit(0).cast("long")
    for p in range(planes):
        plane = F.array(*[F.lit(_hyperplane(p, d)) for d in range(dims)])
        proj = dot(embedding, plane)
        acc = acc + F.when(proj >= 0, F.lit(2 ** p).cast("long")).otherwise(F.lit(0).cast("long"))
    return acc


def ann_lsh_topk(
    emb: DataFrame,
    dims: int,
    k: int = 5,
    planes: int = 16,
    vec_id: str = "vec_id",
    embedding: str = "embedding",
) -> DataFrame:
    """Approximate kNN: exact cosine ranking within SRP-LSH buckets.

    Vectors whose signatures share a bucket are compared exactly; everything
    else is pruned. Buckets are materialized once (groupBy sig + in-array
    pair expansion) rather than via a self-join, which would re-execute the
    ``planes × dims`` projection subplan for both join branches; the plain
    vectors are then joined back for exact scoring — the 100 TB-safe shape.
    Recall is tuned by ``planes`` (fewer planes → bigger buckets → higher
    recall, more work).

    Returns (query_id, neighbor_id, cos_sim, rk) — rk within-bucket.
    """
    base = emb.select(
        F.col(vec_id).alias("vid"),
        as_double_array(F.col(embedding)).alias("v"),
    )
    sig = base.withColumn("sig", srp_signature(F.col("v"), dims, planes))
    groups = (
        sig.groupBy("sig")
        .agg(F.sort_array(F.collect_set("vid")).alias("ids"))
        .where(F.size("ids") > 1)
    )
    ids = F.col("ids")
    # all ordered pairs (a ≠ b) within the bucket — each is its own query
    pair_structs = F.flatten(
        F.transform(
            ids,
            lambda x: F.filter(
                F.transform(ids, lambda y: F.struct(x.alias("q"), y.alias("n"))),
                lambda p: p["q"] != p["n"],
            ),
        )
    )
    pairs = (
        groups.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.q").alias("query_id"), F.col("p.n").alias("neighbor_id"))
        .distinct()
    )
    vec = base.withColumn("nrm", l2_norm(F.col("v")))
    qa = vec.select(
        F.col("vid").alias("query_id"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    nb = vec.select(
        F.col("vid").alias("neighbor_id"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    scored = (
        pairs.join(qa, "query_id")
        .join(nb, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )
