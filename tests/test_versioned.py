"""Versioned dataset snapshots (sinks/versioned.py): linear history,
pinned reads, crash-safe publish protocol, explicit pruning."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.sinks import versioned


def test_linear_history_and_pinned_reads(spark, tmp_path):
    root = str(tmp_path / "ds")
    v1 = versioned.write_version(spark.range(10), root, note="first")
    v2 = versioned.write_version(spark.range(25), root, note="second")
    assert (v1, v2) == (1, 2)
    assert versioned.latest_version(root) == 2
    # head follows the pointer; pinned reads stay reproducible
    assert versioned.read_version(spark, root).count() == 25
    assert versioned.read_version(spark, root, 1).count() == 10
    mans = versioned.list_versions(root)
    assert [m["version"] for m in mans] == [1, 2]
    assert [m["rows"] for m in mans] == [10, 25]
    assert mans[0]["note"] == "first"


def test_crashed_publish_is_invisible_and_recovered(spark, tmp_path):
    root = str(tmp_path / "ds2")
    versioned.write_version(spark.range(5), root)
    # simulate a crash AFTER the data write, BEFORE the manifest: an
    # orphan v=2 dir exists but nothing references it
    spark.range(999).write.mode("overwrite").parquet(
        os.path.join(root, "v=2")
    )
    assert versioned.latest_version(root) == 1
    assert [m["version"] for m in versioned.list_versions(root)] == [1]
    with pytest.raises(FileNotFoundError, match="not published"):
        versioned.read_version(spark, root, 2)
    # the next publish claims number 2, overwriting the orphan
    v = versioned.write_version(spark.range(7), root)
    assert v == 2
    assert versioned.read_version(spark, root, 2).count() == 7


def test_prune_keeps_head_and_unpublishes_old(spark, tmp_path):
    root = str(tmp_path / "ds3")
    for n in (3, 4, 5, 6):
        versioned.write_version(spark.range(n), root)
    doomed = versioned.prune_versions(root, keep_last=2)
    assert doomed == [1, 2]
    assert [m["version"] for m in versioned.list_versions(root)] == [3, 4]
    assert versioned.read_version(spark, root).count() == 6
    with pytest.raises(FileNotFoundError):
        versioned.read_version(spark, root, 1)
    with pytest.raises(ValueError):
        versioned.prune_versions(root, keep_last=0)


def test_empty_root_contracts(spark, tmp_path):
    root = str(tmp_path / "nope")
    assert versioned.latest_version(root) is None
    assert versioned.list_versions(root) == []
    with pytest.raises(FileNotFoundError, match="no published versions"):
        versioned.read_version(spark, root)


def test_curation_snapshot_composes(spark, tmp_path, sf_smoke):
    """The motivating composition: publish a curated corpus, keep
    training against the pinned version while a new curation lands."""
    from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table

    root = str(tmp_path / "corpus")
    docs = load_table(spark, sf_smoke, "documents")
    v1 = versioned.write_version(docs.where(F.col("doc_id") % 2 == 0), root)
    pinned = versioned.read_version(spark, root, v1)
    n_pinned = pinned.count()
    versioned.write_version(docs, root, note="full recuration")
    # the pinned handle still reads version-1 bytes
    assert versioned.read_version(spark, root, v1).count() == n_pinned
    assert versioned.read_version(spark, root).count() == docs.count()


def test_manifest_without_pointer_is_not_published(spark, tmp_path):
    """Crash AFTER the manifest write but BEFORE the pointer rename: the
    version must be invisible (its number gets reclaimed and its bytes
    rewritten by the next publish — pinning it would not be reproducible)."""
    import json

    root = str(tmp_path / "ds4")
    versioned.write_version(spark.range(5), root)
    # simulate the crash: v2 data + manifest exist, pointer still says 1
    spark.range(99).write.parquet(os.path.join(root, "v=2"))
    with open(os.path.join(root, "_v2.commit"), "w") as f:
        json.dump({"version": 2, "rows": 99, "schema": "x", "note": ""}, f)
    assert versioned.latest_version(root) == 1
    assert [m["version"] for m in versioned.list_versions(root)] == [1]
    with pytest.raises(FileNotFoundError, match="not published"):
        versioned.read_version(spark, root, 2)
    # the next publish reclaims number 2 and commits it properly
    v = versioned.write_version(spark.range(7), root)
    assert v == 2
    assert versioned.read_version(spark, root, 2).count() == 7
    assert versioned.list_versions(root)[-1]["rows"] == 7
