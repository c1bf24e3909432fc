"""Streaming near-dup ingest (streaming/neardup.py): batch-split parity
with the one-shot dedup, replay idempotency of the batch-id-keyed writes,
and the end-to-end readStream → foreachBatch wiring."""

from __future__ import annotations

from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.operators import dedup
from vmware_sd_wan_velocloud_bi_intake_spark.streaming.neardup import (
    make_near_dup_ingest,
    read_survivors,
)

_KNOBS = dict(threshold=0.4, num_hashes=4, bands=2, shingle_n=3)


def _docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the morning sun"
    )
    rows = [
        (0, base),
        (1, base + " extra"),               # near-dup of 0, same batch
        (2, "completely different content about spark shuffles and "
            "partitions and the catalyst optimizer pipeline stages"),
        (3, base + " again today"),          # near-dup of 0, LATER batch
        (4, "numbers one two three four five six seven eight nine ten "
            "eleven twelve thirteen fourteen fifteen sixteen seventeen"),
        (5, base),                           # exact dup of 0, later batch
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _expected_batch_survivors(docs):
    exact = dedup.exact_dedup_keys(docs, "doc_id", "text")
    keep = exact.select(F.col("keep_id").alias("doc_id"))
    kept = docs.join(keep, "doc_id", "left_semi")
    pairs = dedup.near_dup_pairs(kept, "doc_id", "text", **_KNOBS)
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return {
        r["doc_id"] for r in kept.join(losers, "doc_id", "left_anti").collect()
    }


def test_batch_split_parity_and_replay_idempotency(spark, tmp_path):
    docs = _docs(spark)
    # ids are monotone in arrival order, so first-arrival-wins == min-id:
    # the streamed survivor set must equal the one-shot batch run's
    expected = _expected_batch_survivors(docs)
    idx = str(tmp_path / "lsh_index")
    surv = str(tmp_path / "survivors")
    ingest = make_near_dup_ingest(idx, surv, **_KNOBS)
    b0 = docs.where("doc_id < 3")
    b1 = docs.where("doc_id >= 3")
    ingest(b0, 0)
    ingest(b1, 1)
    got = {r["doc_id"] for r in read_survivors(spark, surv).collect()}
    assert got == expected
    # replaying a micro-batch (the foreachBatch at-least-once case) must
    # leave every table byte-identical — batch-id-keyed dynamic overwrite
    before = sorted(map(tuple, spark.read.parquet(idx).collect()))
    ingest(b1, 1)
    assert {r["doc_id"] for r in read_survivors(spark, surv).collect()} == expected
    assert sorted(map(tuple, spark.read.parquet(idx).collect())) == before


def test_corpus_duplicates_dropped_not_first_arrivals(spark, tmp_path):
    docs = _docs(spark)
    idx = str(tmp_path / "idx2")
    surv = str(tmp_path / "surv2")
    ingest = make_near_dup_ingest(idx, surv, **_KNOBS)
    ingest(docs.where("doc_id IN (0, 2)"), 0)
    ingest(docs.where("doc_id IN (3, 4)"), 1)   # 3 near-dups corpus doc 0
    ingest(docs.where("doc_id = 5"), 2)         # 5 exact-dups corpus doc 0
    got = {r["doc_id"] for r in read_survivors(spark, surv).collect()}
    assert got == {0, 2, 4}
    # the index grew only by the novel docs' band rows
    idx_docs = {
        r["doc_id"] for r in spark.read.parquet(idx).select("doc_id").collect()
    }
    assert idx_docs == {0, 2, 4}


def test_end_to_end_readstream_wiring(spark, tmp_path):
    docs = _docs(spark)
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    for i, pred in enumerate(["doc_id < 3", "doc_id >= 3"]):
        docs.where(pred).coalesce(1).write.parquet(
            str(stream_dir / f"b{i:03d}.parquet")
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stream_dir / "*.parquet"))
    )
    idx = str(tmp_path / "idx3")
    surv = str(tmp_path / "surv3")
    q = (
        stream.writeStream.foreachBatch(make_near_dup_ingest(idx, surv, **_KNOBS))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in read_survivors(spark, surv).collect()}
    assert got == _expected_batch_survivors(docs)


def test_replay_after_partial_crash_converges(spark, tmp_path):
    """Crash-mid-publish: survivors landed but the index write died. The
    engine replays the batch (foreachBatch at-least-once); the replay must
    rewrite the survivor partition byte-identically AND complete the index
    — converging to exactly the clean-run state."""
    import shutil

    docs = _docs(spark)
    idx = str(tmp_path / "idx4")
    surv = str(tmp_path / "surv4")
    ingest = make_near_dup_ingest(idx, surv, **_KNOBS)
    b0 = docs.where("doc_id < 3")
    ingest(b0, 0)
    # simulate the crash: batch 0's index partition vanishes, survivors stay
    shutil.rmtree(idx)
    ingest(b0, 0)  # replay
    got = {r["doc_id"] for r in read_survivors(spark, surv).collect()}
    assert got == _expected_batch_survivors(b0)
    idx_docs = {
        r["doc_id"] for r in spark.read.parquet(idx).select("doc_id").collect()
    }
    assert idx_docs == got


def test_replay_after_summary_crash_does_not_wedge(spark, tmp_path):
    """Crash between the index write and the summary write: the replay
    sees an index with no summary parts and must FALL BACK to deriving
    the cap in-plan (near_dup_pairs_incremental's documented path) rather
    than failing on the missing parquet dir — then complete the publish."""
    import shutil

    docs = _docs(spark)
    idx = str(tmp_path / "idx5")
    surv = str(tmp_path / "surv5")
    ingest = make_near_dup_ingest(idx, surv, **_KNOBS)
    b0 = docs.where("doc_id < 3")
    b1 = docs.where("doc_id >= 3")
    ingest(b0, 0)
    shutil.rmtree(idx + "_summary_parts")  # the crash window
    ingest(b1, 1)  # must not raise
    got = {r["doc_id"] for r in read_survivors(spark, surv).collect()}
    assert got == _expected_batch_survivors(docs)
    # batch 1 re-published its summary part; batch 0's stays missing until
    # ITS replay — the reader aggregate tolerates the partial parts table
    import os as _os

    assert _os.path.isdir(idx + "_summary_parts")
