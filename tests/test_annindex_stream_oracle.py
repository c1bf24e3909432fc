"""Full SQL-oracle verification of the streamed ANN-index ingest
(streaming/annindex.make_ann_index_ingest) — VERDICT r10 "Next round" #2:
the one index-maintaining ingest that was verified only by numpy parity
gets the same two-phase DuckDB replay discipline as the semantic-dedup
ingest (tests/test_semdedup_stream_oracle.py).

The REAL Structured Streaming path — readStream → maxFilesPerTrigger=1 →
foreachBatch → availableNow over a deterministic two-file monotone-id
arrival split — must equal the SQL replay EXACTLY on the persisted index
members (cell, codes, rounded norm, arrival batch) and on the stored
occupancy baseline:

- phase 1 (build batch, ids ≤ midpoint): coarse quantizer = quantized
  Lloyd over the build half (the shared ``_lloyd_replay_prefix`` the
  sim_ann_ivf / dedup_semantic_stream oracles already use), PQ codebooks
  = quantized per-subspace Lloyd unrolled as CTEs (md5-ordered sample,
  first-ksub init, ROUND(d2, 6) argmin with first-min ties, ROUND(mean,
  6) recentring, empty codes keep their centroid — mirroring
  operators/pq.train_pq_codebooks(round_decimals=6) step for step), then
  the build batch encoded at those books;
- phase 2 (append batch): encoded at the FROZEN quantizers
  (ivf_pq_append) — the replay encodes the second half against the same
  replayed books and centroids, never retraining.

Quantization (round_decimals=6, fingerprinted in the index knobs) is
what makes the replay exact: every argmin/argmax sees only rounded
values, so ulp-level accumulation differences between numpy and DuckDB
cannot flip a cell or a code.
"""

from __future__ import annotations

import json
import os

import duckdb

from vmware_sd_wan_velocloud_bi_intake_spark.queries.textvec import (
    _arrival_split_src,
    _codebook_replay_sql,
    _lloyd_replay_prefix,
    _stream_scratch_dir,
)
from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table
from vmware_sd_wan_velocloud_bi_intake_spark.streaming.annindex import (
    make_ann_index_ingest,
)
from vmware_sd_wan_velocloud_bi_intake_spark.streaming.ingestbase import (
    run_file_ingest,
)

_M = 4  # subspaces (d=64 → dsub=16)
_KSUB = 8
_ITERS = 3
_RD = 6
_TRAIN_WHERE = (
    # OR arm: the degenerate split (no id clears the midpoint) delivers
    # everything as micro-batch 0, so the build/training population is
    # the whole table (same guard as the production stream oracles)
    "WHERE vec_id <= (SELECT CAST(MAX(vec_id) // 2 AS BIGINT) FROM v) "
    "OR NOT EXISTS (SELECT 1 FROM v v2 WHERE v2.vec_id <= "
    "(SELECT CAST(MAX(vec_id) // 2 AS BIGINT) FROM v))"
)
_ARR_CASE = """CASE WHEN NOT EXISTS (SELECT 1 FROM v v2 WHERE v2.vec_id <=
                (SELECT CAST(MAX(vec_id) // 2 AS BIGINT) FROM v)) THEN 0
            WHEN a.vec_id <= (SELECT CAST(MAX(vec_id) // 2 AS BIGINT) FROM v)
            THEN 0 ELSE 1 END"""


# the unrolled per-subspace Lloyd replay builder now lives in
# queries/textvec.py (_codebook_replay_sql — r13 ported it in-catalog for
# the sim_ann_ivf PQ/ADC riders); this test imports it so the streamed
# ingest and the catalog oracle pin ONE replay definition.


def _members_oracle_sql(residual: bool = False) -> str:
    return (
        _lloyd_replay_prefix(_ITERS, _TRAIN_WHERE)
        + _codebook_replay_sql(_M, _KSUB, _ITERS, 64 // _M, residual=residual,
                             train_where=_TRAIN_WHERE)
        + f"""
SELECT a.vec_id, a.cell, cl.codes, ROUND(v.nrm, {_RD}) AS nrm_r6,
       {_ARR_CASE} AS arrived_batch
FROM assigned a
JOIN codes_l cl USING (vec_id)
JOIN v USING (vec_id)
"""
    )


import pytest


def _run_streamed_index(spark, sf_correct, residual: bool):
    """Real 2-batch stream at the quantized contract; returns (index_dir,
    canonical member rows). The arrival split is input-only, so both
    variants share the cached split."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_correct, "embeddings").select(
        "vec_id", "embedding"
    )
    src = _arrival_split_src(
        emb, "vec_id", "ann_stream_oracle_", cache_key=sf_correct
    )
    root = _stream_scratch_dir("ann_stream_oracle_run_")
    idx = os.path.join(root, "idx")
    run_file_ingest(
        spark,
        os.path.join(src, "arr=*"),
        "vec_id long, embedding array<float>",
        make_ann_index_ingest(
            idx,
            m=_M,
            ksub=_KSUB,
            train_iters=_ITERS,
            round_decimals=_RD,
            residual=residual,
        ),
        os.path.join(root, "ckpt"),
        max_files_per_trigger=1,
    )
    members = spark.read.parquet(os.path.join(idx, "members")).select(
        F.col("vid").alias("vec_id"),
        "cell",
        "codes",
        F.round("nrm", _RD).alias("nrm_r6"),
        F.col("_batch_id").cast("long").alias("arrived_batch"),
    )
    srows = sorted(
        (
            int(r["vec_id"]),
            int(r["cell"]),
            tuple(int(c) for c in r["codes"]),
            float(r["nrm_r6"]),
            int(r["arrived_batch"]),
        )
        for r in members.collect()
    )
    return idx, srows


@pytest.mark.parametrize(
    "residual",
    [
        pytest.param(False, id="flat"),
        # the residual-path unrolled-Lloyd SQL replay is the suite's
        # single largest test (~6 min); slow tier — the residual path
        # itself stays default-covered by test_pq recall/parity tests
        # and test_streaming_annindex end-to-ends
        pytest.param(True, id="residual", marks=pytest.mark.slow),
    ],
)
def test_streamed_ann_index_matches_two_phase_sql_replay(
    spark, sf_correct, residual
):
    idx, srows = _run_streamed_index(spark, sf_correct, residual)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM '{sf_correct}/embeddings.parquet'"
    )
    od = con.execute(_members_oracle_sql(residual=residual)).fetchall()
    orows = sorted(
        (
            int(vec_id),
            int(cell),
            tuple(int(c) for c in codes),
            float(nrm_r6),
            int(arr),
        )
        for vec_id, cell, codes, nrm_r6, arr in od
    )

    assert len(srows) > 0, "empty index would vacuously pass"
    assert srows == orows
    # both arrival batches must be present, or the append path (frozen
    # quantizers, ivf_pq_append) was never exercised
    assert {r[4] for r in srows} == {0, 1}

    # occupancy baseline: the stored build-batch profile must equal the
    # replay's per-cell counts over the BUILD half only
    with open(os.path.join(idx, "occupancy.json")) as f:
        stored = json.load(f)["profile"]
    want = {
        int(cell): int(n)
        for cell, n in con.execute(
            _lloyd_replay_prefix(_ITERS, _TRAIN_WHERE)
            + """
SELECT a.cell, COUNT(*) AS n
FROM assigned a
WHERE a.vec_id <= (SELECT CAST(MAX(vec_id) // 2 AS BIGINT) FROM v)
   OR NOT EXISTS (SELECT 1 FROM v v2 WHERE v2.vec_id <=
        (SELECT CAST(MAX(vec_id) // 2 AS BIGINT) FROM v))
GROUP BY a.cell
"""
        ).fetchall()
    }
    got = {int(c): int(n) for c, n in stored["counts"].items()}
    assert got == want
    assert stored["n_vectors"] == sum(want.values())


# slow tier (r14 re-tier, VERDICT r13 #2): VERDICT r13 #2 move (annindex stream): extra random-corpus replication; the fixture replay stays default
@pytest.mark.slow
def test_streamed_ann_index_matches_replay_on_random_corpus(
    spark, tmp_path
):
    """One seeded random embedding corpus (Gaussian clusters + duplicate
    vectors, d=32 so the m=4 subspaces slice differently than the
    fixture's d=64): streamed members == replay — the oracle generalizes
    past the shipped fixtures. Flat path (the residual variant differs
    only in the already-parametrized subspace source)."""
    import numpy as np

    rng = np.random.RandomState(17)
    d = 32
    centers = rng.randn(3, d) * 2.0
    vecs = [centers[rng.randint(3)] + rng.randn(d) * 0.4 for _ in range(30)]
    vecs += [vecs[rng.randint(len(vecs))].copy() for _ in range(6)]
    ids = rng.permutation(len(vecs))
    rows = [
        (int(i), [float(x) for x in v.astype(np.float32)])
        for i, v in zip(ids, vecs)
    ]
    sf = tmp_path / "sf_annrand"
    sf.mkdir()
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").coalesce(
        1
    ).write.parquet(str(sf / "embeddings.parquet"))

    from pyspark.sql import functions as F

    src = _arrival_split_src(emb := load_table(spark, str(sf), "embeddings"),
                             "vec_id", "ann_stream_oracle_rand_")
    root = _stream_scratch_dir("ann_stream_oracle_rand_run_")
    idx = os.path.join(root, "idx")
    run_file_ingest(
        spark,
        os.path.join(src, "arr=*"),
        "vec_id long, embedding array<float>",
        make_ann_index_ingest(
            idx, m=_M, ksub=_KSUB, train_iters=_ITERS, round_decimals=_RD
        ),
        os.path.join(root, "ckpt"),
        max_files_per_trigger=1,
    )
    members = spark.read.parquet(os.path.join(idx, "members")).select(
        F.col("vid").alias("vec_id"),
        "cell",
        "codes",
        F.round("nrm", _RD).alias("nrm_r6"),
        F.col("_batch_id").cast("long").alias("arrived_batch"),
    )
    srows = sorted(
        (
            int(r["vec_id"]),
            int(r["cell"]),
            tuple(int(c) for c in r["codes"]),
            float(r["nrm_r6"]),
            int(r["arrived_batch"]),
        )
        for r in members.collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM parquet_scan('{sf}/embeddings.parquet/*.parquet')"
    )
    od = con.execute(
        _lloyd_replay_prefix(_ITERS, _TRAIN_WHERE)
        + _codebook_replay_sql(_M, _KSUB, _ITERS, d // _M, train_where=_TRAIN_WHERE)
        + f"""
SELECT a.vec_id, a.cell, cl.codes, ROUND(v.nrm, {_RD}) AS nrm_r6,
       {_ARR_CASE} AS arrived_batch
FROM assigned a
JOIN codes_l cl USING (vec_id)
JOIN v USING (vec_id)
"""
    ).fetchall()
    orows = sorted(
        (int(v), int(c), tuple(int(x) for x in codes), float(n), int(a))
        for v, c, codes, n, a in od
    )
    assert len(srows) > 0
    assert srows == orows


# slow tier (r14 re-tier, VERDICT r13 #2): VERDICT r13 #2 move (annindex stream): the two-phase SQL replay keeps the oracle class default
@pytest.mark.slow
def test_degenerate_split_single_batch_agrees(spark, tmp_path):
    """No vec_id clears the midpoint: ONE file → one micro-batch → the
    whole table is the build batch; members labeled batch 0 and the
    replay's guard folds its training population and labels the same
    way."""
    import numpy as np

    from pyspark.sql import functions as F

    rng = np.random.RandomState(3)
    rows = [
        (int(30 + 2 * i), [float(x) for x in rng.randn(32).astype(np.float32)])
        for i in range(15)
    ]  # ids 30..58, mid = 58//2 = 29 → no id ≤ 29
    sf = tmp_path / "sf_anndegen"
    sf.mkdir()
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").coalesce(
        1
    ).write.parquet(str(sf / "embeddings.parquet"))

    src = _arrival_split_src(
        load_table(spark, str(sf), "embeddings"), "vec_id", "ann_degen_"
    )
    root = _stream_scratch_dir("ann_degen_run_")
    idx = os.path.join(root, "idx")
    run_file_ingest(
        spark,
        os.path.join(src, "arr=*"),
        "vec_id long, embedding array<float>",
        make_ann_index_ingest(
            idx, m=_M, ksub=_KSUB, train_iters=_ITERS, round_decimals=_RD
        ),
        os.path.join(root, "ckpt"),
        max_files_per_trigger=1,
    )
    members = spark.read.parquet(os.path.join(idx, "members")).select(
        F.col("vid").alias("vec_id"),
        "cell",
        "codes",
        F.round("nrm", _RD).alias("nrm_r6"),
        F.col("_batch_id").cast("long").alias("arrived_batch"),
    )
    srows = sorted(
        (
            int(r["vec_id"]),
            int(r["cell"]),
            tuple(int(c) for c in r["codes"]),
            float(r["nrm_r6"]),
            int(r["arrived_batch"]),
        )
        for r in members.collect()
    )
    assert {r[4] for r in srows} == {0}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM parquet_scan('{sf}/embeddings.parquet/*.parquet')"
    )
    od = con.execute(
        _lloyd_replay_prefix(_ITERS, _TRAIN_WHERE)
        + _codebook_replay_sql(_M, _KSUB, _ITERS, 32 // _M, train_where=_TRAIN_WHERE)
        + f"""
SELECT a.vec_id, a.cell, cl.codes, ROUND(v.nrm, {_RD}) AS nrm_r6,
       {_ARR_CASE} AS arrived_batch
FROM assigned a
JOIN codes_l cl USING (vec_id)
JOIN v USING (vec_id)
"""
    ).fetchall()
    orows = sorted(
        (int(v), int(c), tuple(int(x) for x in codes), float(n), int(a))
        for v, c, codes, n, a in od
    )
    assert srows == orows
