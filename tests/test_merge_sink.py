"""Full MERGE clause-set semantics over parquet (sinks/merge.py).

Covers every ANSI clause the reference's per-row upserts imply
(fun_mysql_inserts.py:16-374): whole-row update, column-subset update,
conditional update, matched delete, conditional insert, and
not-matched-by-source delete — plus the partition-pruned write path.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.sinks.merge import merge_parquet


def _rows(spark, path, cols=("k", "v", "n")):
    return {
        tuple(r[c] for c in cols) for r in spark.read.parquet(path).collect()
    }


def _seed(spark, path):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, v string, n int"
    )
    merge_parquet(spark, df, path, ["k"])
    return df


def test_merge_update_and_insert(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    batch = spark.createDataFrame(
        [(2, "B", 200), (4, "d", 40)], "k int, v string, n int"
    )
    merge_parquet(spark, batch, path, ["k"])
    assert _rows(spark, path) == {
        (1, "a", 10), (2, "B", 200), (3, "c", 30), (4, "d", 40)
    }


def test_merge_column_subset_update(spark, tmp_path):
    """Blind-column update (S11): only `n` updates; `v` keeps target value."""
    path = str(tmp_path / "t")
    _seed(spark, path)
    batch = spark.createDataFrame([(2, "IGNORED", 999)], "k int, v string, n int")
    merge_parquet(
        spark, batch, path, ["k"], matched_update={"n": F.col("src.n")}
    )
    assert _rows(spark, path) == {(1, "a", 10), (2, "b", 999), (3, "c", 30)}


def test_merge_computed_update_and_condition(spark, tmp_path):
    """UPDATE SET n = tgt.n + src.n, only WHEN src.n > 25."""
    path = str(tmp_path / "t")
    _seed(spark, path)
    batch = spark.createDataFrame(
        [(1, "x", 5), (2, "y", 100)], "k int, v string, n int"
    )
    merge_parquet(
        spark,
        batch,
        path,
        ["k"],
        matched_update={"n": F.col("tgt.n") + F.col("src.n")},
        matched_update_condition=F.col("src.n") > 25,
    )
    # k=1: condition false -> untouched; k=2: n = 20 + 100
    assert _rows(spark, path) == {(1, "a", 10), (2, "b", 120), (3, "c", 30)}


def test_merge_matched_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    batch = spark.createDataFrame(
        [(1, "tomb", 0), (2, "keep", 21)], "k int, v string, n int"
    )
    merge_parquet(
        spark,
        batch,
        path,
        ["k"],
        matched_delete_condition=F.col("src.v") == "tomb",
    )
    assert _rows(spark, path) == {(2, "keep", 21), (3, "c", 30)}


def test_merge_conditional_insert(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    batch = spark.createDataFrame(
        [(4, "d", 40), (5, "e", -1)], "k int, v string, n int"
    )
    merge_parquet(
        spark,
        batch,
        path,
        ["k"],
        not_matched_insert_condition=F.col("src.n") >= 0,
    )
    got = _rows(spark, path)
    assert (4, "d", 40) in got and not any(r[0] == 5 for r in got)


def test_merge_not_matched_by_source_delete(spark, tmp_path):
    """Full-sync semantics: target rows absent from the batch are dropped."""
    path = str(tmp_path / "t")
    _seed(spark, path)
    batch = spark.createDataFrame([(2, "B", 200)], "k int, v string, n int")
    merge_parquet(
        spark,
        batch,
        path,
        ["k"],
        not_matched_by_source_delete_condition=True,
    )
    assert _rows(spark, path) == {(2, "B", 200)}


def test_merge_idempotent_and_dedups_source(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    batch = spark.createDataFrame(
        [(2, "B", 1), (2, "B", 2)], "k int, v string, n int"
    )
    merge_parquet(spark, batch, path, ["k"])
    once = _rows(spark, path)
    assert once == {(1, "a", 10), (2, "B", 2), (3, "c", 30)}
    merge_parquet(spark, batch, path, ["k"])
    assert _rows(spark, path) == once


def test_merge_null_key_matches_null_key(spark, tmp_path):
    """eqNullSafe join: a NULL key is a real key, matched not duplicated."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(None, "a", 1), (1, "b", 2)], "k int, v string, n int")
    merge_parquet(spark, df, path, ["k"])
    batch = spark.createDataFrame([(None, "A", 10)], "k int, v string, n int")
    merge_parquet(spark, batch, path, ["k"])
    assert _rows(spark, path) == {(None, "A", 10), (1, "b", 2)}


def test_merge_partitioned_rewrites_only_touched_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "2024-01", 10), (2, "2024-01", 20), (3, "2024-02", 30)],
        "k int, month string, n int",
    )
    merge_parquet(spark, df, path, ["k"], partition_by="month")
    untouched = os.path.join(path, "month=2024-02")
    before = {
        f: os.path.getmtime(os.path.join(untouched, f))
        for f in os.listdir(untouched)
    }
    batch = spark.createDataFrame(
        [(2, "2024-01", 200), (4, "2024-01", 40)], "k int, month string, n int"
    )
    merge_parquet(spark, batch, path, ["k"], partition_by="month")
    after = {
        f: os.path.getmtime(os.path.join(untouched, f))
        for f in os.listdir(untouched)
    }
    # untouched partition's files are byte-for-byte the same ones
    assert after == before
    assert _rows(spark, path, cols=("k", "month", "n")) == {
        (1, "2024-01", 10),
        (2, "2024-01", 200),
        (3, "2024-02", 30),
        (4, "2024-01", 40),
    }


def test_merge_partitioned_rejects_nmbs_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "m1", 1)], "k int, month string, n int")
    merge_parquet(spark, df, path, ["k"], partition_by="month")
    with pytest.raises(ValueError, match="not_matched_by_source"):
        merge_parquet(
            spark,
            df,
            path,
            ["k"],
            partition_by="month",
            not_matched_by_source_delete_condition=True,
        )


def test_merge_schema_mismatch_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    bad = spark.createDataFrame([(1, "a")], "k int, v string")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_parquet(spark, bad, path, ["k"])


def test_merge_null_condition_does_not_fire(spark, tmp_path):
    """ANSI MERGE: a clause with a NULL condition does not fire — a NULL
    in the delete predicate must KEEP the target row, never delete it."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a", None), (2, "b", 20)], "k int, v string, n int")
    merge_parquet(spark, df, path, ["k"])
    batch = spark.createDataFrame([(1, "x", None), (2, "y", 5)], "k int, v string, n int")
    merge_parquet(
        spark,
        batch,
        path,
        ["k"],
        matched_update=False,
        matched_delete_condition=F.col("src.n") < 10,  # NULL for k=1
    )
    # k=1: condition NULL -> kept; k=2: 5 < 10 -> deleted
    assert _rows(spark, path) == {(1, "a", None)}


def test_merge_partitioned_null_partition_preserved(spark, tmp_path):
    """A batch touching the NULL partition must merge WITH its existing
    rows, not overwrite the partition from the batch alone."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, None, 10), (2, None, 20), (3, "m1", 30)],
        "k int, month string, n int",
    )
    merge_parquet(spark, df, path, ["k"], partition_by="month")
    batch = spark.createDataFrame([(4, None, 40)], "k int, month string, n int")
    merge_parquet(spark, batch, path, ["k"], partition_by="month")
    assert _rows(spark, path, cols=("k", "month", "n")) == {
        (1, None, 10),
        (2, None, 20),
        (3, "m1", 30),
        (4, None, 40),
    }


def test_merge_partitioned_fully_deleted_partition_is_dropped(spark, tmp_path):
    """Dynamic overwrite writes nothing for a partition whose rows all
    deleted — the sink must drop the stale directory instead of silently
    resurrecting the rows on the next read."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "m1", 10), (2, "m1", 20), (3, "m2", 30)],
        "k int, month string, n int",
    )
    merge_parquet(spark, df, path, ["k"], partition_by="month")
    batch = spark.createDataFrame(
        [(1, "m1", 0), (2, "m1", 0)], "k int, month string, n int"
    )
    merge_parquet(
        spark,
        batch,
        path,
        ["k"],
        partition_by="month",
        matched_delete_condition=True,
        not_matched_insert=False,
    )
    assert not os.path.exists(os.path.join(path, "month=m1"))
    assert _rows(spark, path, cols=("k", "month", "n")) == {(3, "m2", 30)}
    # manifest cleared on the happy path
    assert not os.path.exists(os.path.join(path, "_pending_partition_drops.json"))


def test_merge_crash_window_drop_recovers(spark, tmp_path):
    """A crash between the dynamic overwrite and the emptied-partition drop
    leaves the tombstone manifest behind; the NEXT merge over the table must
    heal it before reading, so the 'deleted' rows never resurrect."""
    from vmware_sd_wan_velocloud_bi_intake_spark.sinks import merge as m

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "m1", 10), (2, "m2", 20)], "k int, month string, n int"
    )
    merge_parquet(spark, df, path, ["k"], partition_by="month")
    # simulate the crash window: manifest staged, directory never dropped
    m._stage_drop_manifest(path, "month", ["m1"])
    assert os.path.exists(os.path.join(path, "month=m1"))
    # next merge (touching a different partition) heals first
    batch = spark.createDataFrame([(2, "m2", 200)], "k int, month string, n int")
    merge_parquet(spark, batch, path, ["k"], partition_by="month")
    assert not os.path.exists(os.path.join(path, "month=m1"))
    assert not os.path.exists(os.path.join(path, m._DROP_MANIFEST))
    assert _rows(spark, path, cols=("k", "month", "n")) == {(2, "m2", 200)}
    # the read-time healer is a no-op on a clean table / missing path
    m.recover_pending_drops(path)
    m.recover_pending_drops(str(tmp_path / "nope"))
