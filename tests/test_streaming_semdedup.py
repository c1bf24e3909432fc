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


# slow tier (r14 re-tier, VERDICT r13 #2): compaction-preservation class kept default on the neardup ingest (shared sinks/compact skeleton)
@pytest.mark.slow
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


def test_semantic_survivors_publish_as_versions(spark, emb, tmp_path):
    """The release pipeline composes with embedding corpora too: the
    semantic survivor table snapshots through the same gate into pinned
    versions (vec_id profiled; the embedding column rides as a
    complex-type nulls-only profile row)."""
    from vmware_sd_wan_velocloud_bi_intake_spark.plans.publish import (
        publish_stream_snapshot,
    )
    from vmware_sd_wan_velocloud_bi_intake_spark.sinks import versioned

    idx = str(tmp_path / "sd_pub")
    surv = str(tmp_path / "sd_pub_s")
    root = str(tmp_path / "sd_releases")
    ingest = make_semantic_dedup_ingest(idx, surv, **_KNOBS)
    ingest(emb.where("vec_id % 2 = 0"), 0)
    # the snapshot normalizes custom column names to doc_id/text — rules
    # address the normalized names
    rules = [{"column": "doc_id", "max_null_frac": 0.0, "min_rows": 10}]
    v1 = publish_stream_snapshot(
        spark, surv, root, doc_id="vec_id", text_col="embedding", rules=rules
    )
    assert v1 == 1
    pinned = versioned.read_version(spark, root, v1)
    assert {r["doc_id"] for r in pinned.select("doc_id").collect()} == (
        _survivor_ids(spark, surv)
    )
    # the stream grows; the next snapshot pins v2 while v1 stays readable
    ingest(emb.where("vec_id % 2 = 1"), 1)
    v2 = publish_stream_snapshot(
        spark, surv, root, doc_id="vec_id", text_col="embedding", rules=rules
    )
    assert v2 == 2
    assert versioned.read_version(spark, root, 1).count() == pinned.count()


def test_drift_monitor_and_rebuild(spark, emb, tmp_path):
    """The semantic ingest carries the same quantizer-drift monitor as
    the ANN ingest: a topic-shifted batch trips it, the in-place rebuild
    (members carry raw vectors — no external corpus needed) retrains and
    re-assigns, the monitor reads clean, survivors stay untouched, and a
    checkpoint-lagged head-batch replay no-ops instead of emptying its
    survivors partition."""
    import numpy as np

    from vmware_sd_wan_velocloud_bi_intake_spark.streaming.semdedup import (
        rebuild_semantic_index,
        semantic_needs_retrain,
    )

    idx = str(tmp_path / "sd_drift")
    surv = str(tmp_path / "sd_drift_s")
    ingest = make_semantic_dedup_ingest(idx, surv, **_KNOBS)
    b0 = emb.where("vec_id % 2 = 0")
    ingest(b0, 0)
    assert not semantic_needs_retrain(spark, idx)
    rng = np.random.default_rng(3)
    a = rng.standard_normal(64)
    a = a / np.linalg.norm(a)
    anchor = F.array(*[F.lit(float(x)) for x in a])
    shifted = emb.where("vec_id % 2 = 1").select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.zip_with(
            sim.as_double_array(F.col("embedding")),
            anchor,
            lambda v, x: F.lit(0.1) * v + x,
        )
        .cast("array<float>")  # match the survivors table's storage type
        .alias("embedding"),
    )
    shifted = shifted.cache()
    shifted.count()
    ingest(shifted, 1)
    assert semantic_needs_retrain(spark, idx)
    before_survivors = _survivor_ids(spark, surv)
    rebuild_semantic_index(spark, idx)
    assert not semantic_needs_retrain(spark, idx)
    assert _survivor_ids(spark, surv) == before_survivors  # history immutable
    members = spark.read.parquet(idx + "/members")
    assert members.count() == len(before_survivors)
    assert {
        r["_batch_id"]
        for r in members.select("_batch_id").distinct().collect()
    } == {-1}
    # checkpoint-lagged replay of the folded head batch: safe no-op
    ingest(shifted, 1)
    assert _survivor_ids(spark, surv) == before_survivors
    assert spark.read.parquet(idx + "/members").count() == len(before_survivors)
    # the stream continues at the rebuilt quantizer
    fresh = shifted.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    ingest(fresh, 2)
    assert len(_survivor_ids(spark, surv)) >= len(before_survivors)
    shifted.unpersist()


def test_fully_duplicate_batch_records_no_drift(spark, emb, tmp_path):
    """A batch whose every row is a corpus duplicate appends nothing —
    the drift part must still land (tv 0, no retrain), not crash on an
    empty histogram."""
    from vmware_sd_wan_velocloud_bi_intake_spark.streaming.semdedup import (
        semantic_drift_history,
        semantic_needs_retrain,
    )

    idx = str(tmp_path / "sd_dup")
    surv = str(tmp_path / "sd_dup_s")
    ingest = make_semantic_dedup_ingest(idx, surv, **_KNOBS)
    b0 = emb.where("vec_id % 2 = 0")
    ingest(b0, 0)
    ingest(b0.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding"), 1)
    hist = {r["batch"]: r for r in semantic_drift_history(spark, idx).collect()}
    assert hist[1]["tv_distance"] == 0.0 and not hist[1]["retrain"]
    assert not semantic_needs_retrain(spark, idx)


def test_pre_monitor_index_requires_occupancy_backfill(spark, emb, tmp_path):
    """An index from before the drift monitor existed (no occupancy.json)
    must refuse to silently bootstrap a baseline from a mid-stream batch;
    backfill_occupancy derives it from the full current members, after
    which the stream proceeds and verdicts record."""
    import os
    import shutil

    from vmware_sd_wan_velocloud_bi_intake_spark.streaming.semdedup import (
        backfill_occupancy,
        semantic_drift_history,
    )

    idx = str(tmp_path / "sd_legacy")
    surv = str(tmp_path / "sd_legacy_s")
    ingest = make_semantic_dedup_ingest(idx, surv, **_KNOBS)
    ingest(emb.where("vec_id % 2 = 0"), 0)
    # simulate the pre-monitor layout
    os.remove(idx + "/occupancy.json")
    shutil.rmtree(idx + "/drift_parts")
    with pytest.raises(ValueError, match="backfill_occupancy"):
        ingest(emb.where("vec_id % 2 = 1"), 1)
    backfill_occupancy(spark, idx)
    ingest(emb.where("vec_id % 2 = 1"), 1)
    hist = {r["batch"] for r in semantic_drift_history(spark, idx).collect()}
    assert 1 in hist  # the post-backfill batch recorded its verdict


# slow tier (r14 re-tier, VERDICT r13 #2): readStream wiring exercised by the semdedup stream two-phase oracle test, which stays default
@pytest.mark.slow
def test_end_to_end_readstream_wiring(spark, emb, tmp_path):
    """The ingest runs under real Structured Streaming: file-fed
    micro-batches through writeStream.foreachBatch, survivors match the
    manual two-call run."""
    import os
    import time

    stream_dir = tmp_path / "sd_in"
    stream_dir.mkdir()
    for i, pred in enumerate(["vec_id % 2 = 0", "vec_id % 2 = 1"]):
        d = str(stream_dir / f"b{i:03d}.parquet")
        emb.where(pred).coalesce(1).write.parquet(d)
        # FileStreamSource orders by modification time; pin distinct
        # mtimes so batch order matches the manual even-first run even
        # when both writes land within the same ms
        t = time.time() - 100 + i * 10
        for root, _dirs, files in os.walk(d):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stream_dir / "*.parquet"))
    )
    idx = str(tmp_path / "sd_e2e")
    surv = str(tmp_path / "sd_e2e_s")
    q = (
        stream.writeStream.foreachBatch(
            make_semantic_dedup_ingest(idx, surv, **_KNOBS)
        )
        .option("checkpointLocation", str(tmp_path / "sd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain in time"
    manual_idx = str(tmp_path / "sd_e2e_m")
    manual_surv = str(tmp_path / "sd_e2e_ms")
    manual = make_semantic_dedup_ingest(manual_idx, manual_surv, **_KNOBS)
    manual(emb.where("vec_id % 2 = 0"), 0)
    manual(emb.where("vec_id % 2 = 1"), 1)
    assert _survivor_ids(spark, surv) == _survivor_ids(spark, manual_surv)


def test_build_crash_before_baseline_replays_clean(spark, emb, tmp_path):
    """Crash inside the BUILD batch after the centroids landed but before
    anything else (semdedup writes centroids early, unlike annindex):
    the replay must re-derive everything deterministically — not demand a
    backfill there is no data for."""
    import json
    import os
    import shutil

    idx = str(tmp_path / "sd_bcrash")
    surv = str(tmp_path / "sd_bcrash_s")
    ingest = make_semantic_dedup_ingest(idx, surv, **_KNOBS)
    b0 = emb.where("vec_id % 2 = 0")
    ingest(b0, 0)
    want = _survivor_ids(spark, surv)
    # rewind to the crash point: only centroids + knobs (head unrecorded)
    shutil.rmtree(idx + "/members")
    shutil.rmtree(idx + "/drift_parts")
    shutil.rmtree(surv)
    os.remove(idx + "/occupancy.json")
    knobs_path = idx + "_knobs.json"
    with open(knobs_path) as f:
        stored = json.load(f)
    stored.pop("last_batch_id"), stored.pop("last_batch_fp")
    with open(knobs_path, "w") as f:
        json.dump(stored, f)
    ingest(b0, 0)  # Spark replays the uncommitted build batch
    assert _survivor_ids(spark, surv) == want
    assert os.path.exists(idx + "/occupancy.json")


def test_build_crash_replay_seeds_identical_baseline(spark, emb, tmp_path):
    """Crash in the window between the build batch's MEMBERS write and its
    occupancy write (VERDICT r10 #6): the replay must detect that the only
    committed members carry its own batch id, re-derive the baseline from
    the full batch in hand, and publish occupancy.json BYTE-IDENTICAL to
    the uncrashed build's — so drift verdicts on every later batch are
    replay-identical across the crash window (the survivor-derived
    backfill proxy must never be involved here)."""
    import json
    import os
    import shutil

    from vmware_sd_wan_velocloud_bi_intake_spark.streaming.semdedup import (
        semantic_drift_history,
    )

    idx = str(tmp_path / "sd_mcrash")
    surv = str(tmp_path / "sd_mcrash_s")
    ingest = make_semantic_dedup_ingest(idx, surv, **_KNOBS)
    b0 = emb.where("vec_id % 2 = 0")
    b1 = emb.where("vec_id % 2 = 1")
    ingest(b0, 0)
    with open(idx + "/occupancy.json") as f:
        uncrashed_occupancy = f.read()
    want_surv = _survivor_ids(spark, surv)
    # rewind to the crash point: members + survivors + centroids landed,
    # occupancy + drift part + head did not
    os.remove(idx + "/occupancy.json")
    shutil.rmtree(idx + "/drift_parts")
    knobs_path = idx + "_knobs.json"
    with open(knobs_path) as f:
        stored = json.load(f)
    stored.pop("last_batch_id"), stored.pop("last_batch_fp")
    with open(knobs_path, "w") as f:
        json.dump(stored, f)
    ingest(b0, 0)  # Spark replays the uncommitted build batch
    with open(idx + "/occupancy.json") as f:
        assert f.read() == uncrashed_occupancy, (
            "replayed baseline differs from the uncrashed build's — drift "
            "verdicts would diverge across the crash window"
        )
    assert _survivor_ids(spark, surv) == want_surv
    # the stream proceeds normally and records verdicts against the
    # full-batch baseline
    ingest(b1, 1)
    hist = {r["batch"] for r in semantic_drift_history(spark, idx).collect()}
    assert hist == {0, 1}
