"""Streaming semantic dedup ingest (streaming/semdedup.py): streamed
result equals the operator composition, corpus duplicates drop across
batches, replays are byte-idempotent, guards fire."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.operators import similarity as sim
from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table
from vmware_sd_wan_velocloud_bi_intake_spark.streaming.semdedup import (
    make_semantic_dedup_ingest,
    read_semantic_survivors,
)

_KNOBS = dict(threshold=0.8, n_cells=8, train_iters=4)


@pytest.fixture(scope="module")
def emb(spark, sf_smoke):
    df = load_table(spark, sf_smoke, "embeddings").cache()
    df.count()
    yield df
    df.unpersist()


def _survivor_ids(spark, surv):
    return {
        r["vec_id"] for r in read_semantic_survivors(spark, surv).collect()
    }


def test_streamed_equals_operator_composition(spark, emb, tmp_path):
    """Two micro-batches through the ingest must leave exactly what the
    operator composition produces: in-batch SemDeDup at the build
    quantizer, then the incremental corpus probe for batch 1."""
    idx = str(tmp_path / "sd_idx")
    surv = str(tmp_path / "sd_surv")
    ingest = make_semantic_dedup_ingest(idx, surv, **_KNOBS)
    b0 = emb.where("vec_id % 2 = 0")
    b1 = emb.where("vec_id % 2 = 1")
    ingest(b0, 0)
    cents = spark.read.parquet(idx + "/centroids")
    want0 = {
        r["vec_id"]
        for r in sim.semantic_dedup_survivors(
            b0, threshold=0.8, cents=cents
        ).collect()
    }
    assert _survivor_ids(spark, surv) == want0
    ingest(b1, 1)
    kept1 = b1.join(
        sim.semantic_dedup_survivors(b1, threshold=0.8, cents=cents).select(
            "vec_id"
        ),
        "vec_id",
        "left_semi",
    )
    members0 = spark.read.parquet(idx + "/members").where("_batch_id = 0")
    pairs = sim.semantic_dedup_incremental(
        kept1, cents, members0.drop("_batch_id"), threshold=0.8
    )
    losers = {r["batch_id"] for r in pairs.collect()}
    want1 = {r["vec_id"] for r in kept1.collect()} - losers
    assert _survivor_ids(spark, surv) == want0 | want1


def test_corpus_semantic_dup_dropped_across_batches(spark, emb, tmp_path):
    """A later batch's near-copy of a corpus survivor (cosine ≈ 1 after
    scaling) must be dropped; an unrelated vector must survive."""
    idx = str(tmp_path / "sd_idx2")
    surv = str(tmp_path / "sd_surv2")
    ingest = make_semantic_dedup_ingest(idx, surv, **_KNOBS)
    b0 = emb.where("vec_id % 2 = 0")
    ingest(b0, 0)
    corpus = _survivor_ids(spark, surv)
    donor = min(corpus)
    copy = (
        emb.where(F.col("vec_id") == donor)
        .select(
            F.lit(900000).cast("long").alias("vec_id"),
            F.transform(
                sim.as_double_array(F.col("embedding")),
                lambda x: x * F.lit(1.5),
            )
            .cast("array<float>")  # match the fixture's storage type
            .alias("embedding"),
        )
    )
    fresh = emb.where("vec_id % 2 = 1").limit(1).select(
        F.lit(900001).cast("long").alias("vec_id"), "embedding"
    )
    ingest(copy.unionByName(fresh), 1)
    got = _survivor_ids(spark, surv)
    assert 900000 not in got  # scaled copy: cosine 1.0 vs the donor
    assert 900001 in got      # held-out vector: no corpus twin at 0.8


def test_replay_is_byte_idempotent(spark, emb, tmp_path):
    idx = str(tmp_path / "sd_idx3")
    surv = str(tmp_path / "sd_surv3")
    ingest = make_semantic_dedup_ingest(idx, surv, **_KNOBS)
    b0 = emb.where("vec_id % 2 = 0")
    b1 = emb.where("vec_id % 2 = 1")
    ingest(b0, 0)
    ingest(b1, 1)
    before_surv = sorted(
        map(tuple, spark.read.parquet(surv).select("vec_id", "_batch_id").collect())
    )
    before_mem = sorted(
        map(
            tuple,
            spark.read.parquet(idx + "/members")
            .select("cell", "vid", "_batch_id")
            .collect(),
        )
    )
    ingest(b1, 1)  # foreachBatch at-least-once replay
    assert (
        sorted(
            map(
                tuple,
                spark.read.parquet(surv).select("vec_id", "_batch_id").collect(),
            )
        )
        == before_surv
    )
    assert (
        sorted(
            map(
                tuple,
                spark.read.parquet(idx + "/members")
                .select("cell", "vid", "_batch_id")
                .collect(),
            )
        )
        == before_mem
    )


def test_guards_fire(spark, emb, tmp_path):
    idx = str(tmp_path / "sd_idx4")
    surv = str(tmp_path / "sd_surv4")
    ingest = make_semantic_dedup_ingest(idx, surv, **_KNOBS)
    ingest(emb.where("vec_id % 2 = 0"), 0)
    with pytest.raises(ValueError, match="different content"):
        ingest(emb.where("vec_id = 1"), 0)  # fresh-checkpoint collision
    redeployed = make_semantic_dedup_ingest(
        idx, surv, threshold=0.5, n_cells=8, train_iters=4
    )
    with pytest.raises(ValueError, match="knobs differ"):
        redeployed(emb.where("vec_id % 2 = 1"), 1)


def test_rows_compaction_preserves_survivors(spark, emb, tmp_path):
    import os

    idx = str(tmp_path / "sd_cmp")
    surv = str(tmp_path / "sd_cmp_s")
    idx_u = str(tmp_path / "sd_cmp_u")
    surv_u = str(tmp_path / "sd_cmp_us")
    ingest = make_semantic_dedup_ingest(idx, surv, compact_every=2, **_KNOBS)
    uncompacted = make_semantic_dedup_ingest(
        idx_u, surv_u, compact_every=None, **_KNOBS
    )
    for b in range(6):
        batch = emb.where(f"vec_id % 6 = {b}")
        ingest(batch, b)
        uncompacted(batch, b)
    assert _survivor_ids(spark, surv) == _survivor_ids(spark, surv_u)
    parts = {d for d in os.listdir(surv) if d.startswith("_batch_id=")}
    parts_u = {d for d in os.listdir(surv_u) if d.startswith("_batch_id=")}
    assert len(parts) < len(parts_u) and "_batch_id=-1" in parts
