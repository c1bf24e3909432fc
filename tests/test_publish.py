"""Release pipeline (plans/publish.py): curate → expectation gate →
versioned publish, with the gate refusing to publish a broken curation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.plans.expectations import (
    ExpectationError,
)
from vmware_sd_wan_velocloud_bi_intake_spark.plans.publish import (
    publish_curated_version,
)
from vmware_sd_wan_velocloud_bi_intake_spark.sinks import versioned
from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table


def test_publish_then_pin_then_republish(spark, tmp_path, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    root = str(tmp_path / "corpus")
    v1 = publish_curated_version(docs, root, note="first release")
    assert v1 == 1
    pinned_rows = versioned.read_version(spark, root, v1).count()
    assert pinned_rows > 0
    v2 = publish_curated_version(docs, root, note="second release")
    assert v2 == 2
    # the pinned version is untouched by the republish
    assert versioned.read_version(spark, root, v1).count() == pinned_rows
    notes = [m["note"] for m in versioned.list_versions(root)]
    assert notes == ["first release", "second release"]


def test_gate_failure_publishes_nothing(spark, tmp_path, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    root = str(tmp_path / "gated")
    with pytest.raises(ExpectationError, match="min_rows"):
        publish_curated_version(
            docs,
            root,
            rules=[{"column": "doc_id", "min_rows": 10_000_000}],
        )
    assert versioned.latest_version(root) is None
    assert versioned.list_versions(root) == []


def test_relative_rule_blocks_shrunken_release(spark, tmp_path, sf_smoke):
    """Drift gate: v2 clears every ABSOLUTE rule but drops far more than
    the allowed row-count ratio vs v1 — it must publish nothing, and the
    violation must be the relative rule. A third, back-in-range release
    then publishes as v2 (the rejected attempt reserved no number)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_smoke, "documents")
    root = str(tmp_path / "drift")
    rules = [
        {
            "column": "doc_id",
            "min_rows": 1,              # absolute floor: tiny, both clear it
            "max_null_frac": 0.0,
            "min_row_ratio": 0.6,       # relative: v2 may not lose >40%
        },
    ]
    v1 = publish_curated_version(docs, root, rules=rules)
    assert v1 == 1
    # v1's manifest carries the profile that makes the drift check possible
    prof = versioned.version_profile(root)
    assert prof and {p["column"] for p in prof} == {"doc_id", "text"}
    shrunk = docs.where(F.col("doc_id") % 10 == 0)  # ~10% of v1
    with pytest.raises(ExpectationError, match="min_row_ratio"):
        publish_curated_version(shrunk, root, rules=rules)
    assert versioned.latest_version(root) == 1  # nothing published
    ok = docs.where(F.col("doc_id") % 10 != 3)  # ~90% — inside the ratio
    assert publish_curated_version(ok, root, rules=rules) == 2


def test_relative_rules_skip_without_baseline(spark, tmp_path):
    """v1 has no previous profile; a pre-profile manifest has none either.
    Relative rules must be inert in both cases, not crash or block."""
    from vmware_sd_wan_velocloud_bi_intake_spark.plans.expectations import (
        check_expectations,
    )

    prof = [
        {
            "column": "doc_id",
            "dtype": "bigint",
            "n_rows": 100,
            "n_nulls": 0,
            "null_frac": 0.0,
            "ndv_approx": 100,
            "min_str": "0",
            "max_str": "99",
            "max_len": None,
        }
    ]
    rules = [{"column": "doc_id", "min_row_ratio": 0.9, "min_ndv_ratio": 0.9}]
    assert check_expectations(prof, rules, previous=None) == []
    # baseline present and in range → clean; halved → both ratios fire
    prev = [dict(prof[0], n_rows=105, ndv_approx=105)]
    assert check_expectations(prof, rules, previous=prev) == []
    prev_big = [dict(prof[0], n_rows=250, ndv_approx=250)]
    got = {v["rule"] for v in check_expectations(prof, rules, previous=prev_big)}
    assert got == {"min_row_ratio", "min_ndv_ratio"}
    # zero denominators: no baseline signal, skip
    prev_zero = [dict(prof[0], n_rows=0, ndv_approx=0)]
    assert check_expectations(prof, rules, previous=prev_zero) == []


def test_null_frac_delta_rule(spark, tmp_path):
    from vmware_sd_wan_velocloud_bi_intake_spark.plans.expectations import (
        check_expectations,
    )

    base = {
        "column": "text",
        "dtype": "string",
        "n_rows": 100,
        "n_nulls": 0,
        "null_frac": 0.0,
        "ndv_approx": 90,
        "min_str": "a",
        "max_str": "z",
        "max_len": 50,
    }
    rules = [{"column": "text", "max_null_frac_delta": 0.01}]
    now = [dict(base, n_nulls=5, null_frac=0.05)]
    prev = [base]
    got = check_expectations(now, rules, previous=prev)
    assert [v["rule"] for v in got] == ["max_null_frac_delta"]
    # within tolerance → clean
    assert check_expectations([dict(base, null_frac=0.009)], rules, previous=prev) == []


def test_stream_snapshot_publishes_and_gates_drift(spark, tmp_path):
    """Streaming survivors → gate → versioned snapshot: v1 publishes the
    stream's current survivor set; a later snapshot that would ship a
    shrunken corpus (drift rule) publishes nothing; a grown corpus
    publishes as v2 and pins v1 unchanged."""
    from vmware_sd_wan_velocloud_bi_intake_spark.plans.publish import (
        publish_stream_snapshot,
    )
    from vmware_sd_wan_velocloud_bi_intake_spark.streaming.neardup import (
        make_near_dup_ingest,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the morning sun"
    )
    rows = [(i, f"document number {i} about topic {i % 7} " + base[: 40 + i])
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = str(tmp_path / "snap_idx")
    surv = str(tmp_path / "snap_surv")
    root = str(tmp_path / "snap_root")
    knobs = dict(threshold=0.9, num_hashes=4, bands=2, shingle_n=3)
    ingest = make_near_dup_ingest(idx, surv, **knobs)
    ingest(docs.where("doc_id < 25"), 0)
    rules = [
        {"column": "doc_id", "min_rows": 1, "max_null_frac": 0.0,
         "min_row_ratio": 0.8},
        {"column": "text", "max_null_frac": 0.0},
    ]
    v1 = publish_stream_snapshot(spark, surv, root, rules=rules)
    assert v1 == 1
    v1_rows = versioned.read_version(spark, root, 1).count()
    assert v1_rows > 0
    # stream grows; next snapshot publishes v2, v1 stays pinned
    ingest(docs.where("doc_id >= 25"), 1)
    v2 = publish_stream_snapshot(spark, surv, root, rules=rules)
    assert v2 == 2
    assert versioned.read_version(spark, root, 1).count() == v1_rows
    assert versioned.read_version(spark, root, 2).count() > v1_rows
    # a snapshot pointed at a WRONG (shrunken) survivors dir trips the
    # drift ratio and publishes nothing
    small_surv = str(tmp_path / "small_surv")
    small_idx = str(tmp_path / "small_idx")
    small = make_near_dup_ingest(small_idx, small_surv, **knobs)
    small(docs.where("doc_id < 5"), 0)
    with pytest.raises(ExpectationError, match="min_row_ratio"):
        publish_stream_snapshot(spark, small_surv, root, rules=rules)
    assert versioned.latest_version(root) == 2


def test_stream_snapshot_custom_names_no_collision(spark, tmp_path):
    """Custom doc_id/text_col names must not collide with pre-existing
    literal 'doc_id'/'text' columns in the survivors frame."""
    from vmware_sd_wan_velocloud_bi_intake_spark.plans.publish import (
        publish_stream_snapshot,
    )

    surv = str(tmp_path / "named_surv")
    rows = [(i, f"body of document {i} with enough words", i * 10, "x")
            for i in range(10)]
    (
        spark.createDataFrame(
            rows, "id long, body string, doc_id long, text string"
        )
        .withColumn("_batch_id", (F.col("id") % 2).cast("int"))
        .write.partitionBy("_batch_id")
        .parquet(surv)
    )
    root = str(tmp_path / "named_root")
    v = publish_stream_snapshot(
        spark, surv, root, doc_id="id", text_col="body"
    )
    assert v == 1
    got = versioned.read_version(spark, root, 1)
    assert got.columns.count("doc_id") == 1 and got.columns.count("text") == 1
    assert got.count() == 10


# slow tier (r14 re-tier, VERDICT r13 #2): release-story integration replication; the publish unit gates stay default
@pytest.mark.slow
def test_full_streaming_release_story(spark, tmp_path):
    """The complete r7+r8 composition, end to end through the real
    Structured Streaming engine: readStream → near-dup ingest maintaining
    its own incremental stats → gate on the merged stats (no corpus
    scan) → pinned immutable version; a second micro-wave grows the
    corpus and publishes v2 while v1 stays byte-stable."""
    from vmware_sd_wan_velocloud_bi_intake_spark.operators import incstats
    from vmware_sd_wan_velocloud_bi_intake_spark.plans.publish import (
        publish_stream_snapshot,
    )
    from vmware_sd_wan_velocloud_bi_intake_spark.streaming.neardup import (
        make_near_dup_ingest,
    )

    rows = [
        (i, f"document {i} about subject {i % 5} with several more words "
            f"of body text to shingle {i * 7}")
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    idx = str(tmp_path / "e2e_idx")
    surv = str(tmp_path / "e2e_surv")
    stats = str(tmp_path / "e2e_stats")
    root = str(tmp_path / "e2e_root")
    ingest = make_near_dup_ingest(
        idx, surv, stats_dir=stats,
        threshold=0.9, num_hashes=4, bands=2, shingle_n=3,
    )
    rules = [
        {"column": "doc_id", "min_rows": 1, "max_null_frac": 0.0,
         "min_row_ratio": 0.5},
        {"column": "text", "max_null_frac": 0.0},
    ]

    def run_wave(pred, fname):
        docs.where(pred).coalesce(1).write.parquet(str(stream_dir / fname))
        q = (
            spark.readStream.schema("doc_id long, text string")
            .parquet(str(stream_dir / "*.parquet"))
            .writeStream.foreachBatch(ingest)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_wave("doc_id < 20", "w0.parquet")
    prof = incstats.merged_stats(spark, stats, ["doc_id", "text"])
    v1 = publish_stream_snapshot(spark, surv, root, rules=rules, profile_rows=prof)
    assert v1 == 1
    v1_rows = versioned.read_version(spark, root, 1).count()
    assert v1_rows == 20  # all novel at threshold .9
    run_wave("doc_id >= 20", "w1.parquet")
    prof2 = incstats.merged_stats(spark, stats, ["doc_id", "text"])
    assert prof2[0]["n_rows"] == 30
    v2 = publish_stream_snapshot(spark, surv, root, rules=rules, profile_rows=prof2)
    assert v2 == 2
    assert versioned.read_version(spark, root, 1).count() == v1_rows
    assert versioned.read_version(spark, root, 2).count() == 30
    # the manifests carry both incremental baselines for the next drift gate
    assert versioned.version_profile(root, 1)[0]["n_rows"] == 20
    assert versioned.version_profile(root, 2)[0]["n_rows"] == 30
