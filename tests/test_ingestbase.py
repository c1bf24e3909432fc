"""Shared ingest guards (streaming/ingestbase.py): fingerprint
properties the collision guard depends on."""

from __future__ import annotations

from vmware_sd_wan_velocloud_bi_intake_spark.streaming.ingestbase import (
    batch_fingerprint,
)


def _df(spark, ids):
    return spark.createDataFrame([(i, "x") for i in ids], "doc_id long, text string")


def test_fingerprint_is_order_independent(spark):
    a = batch_fingerprint(_df(spark, [1, 2, 3]), "doc_id")
    b = batch_fingerprint(_df(spark, [3, 1, 2]), "doc_id")
    assert a == b


def test_fingerprint_is_multiplicity_sensitive(spark):
    """XOR-style folds cancel ids with even multiplicity, making
    [A, A, B] collide with [C, C, B]; raw batches here carry duplicate
    ids by design (the ingests dedup them), so the fingerprint must see
    multiplicity."""
    a = batch_fingerprint(_df(spark, [10, 10, 7]), "doc_id")
    b = batch_fingerprint(_df(spark, [99, 99, 7]), "doc_id")
    assert a != b
    # and duplicate count changes the fingerprint too
    c = batch_fingerprint(_df(spark, [10, 7]), "doc_id")
    assert a != c


def test_fingerprint_empty_batch(spark):
    assert batch_fingerprint(_df(spark, []), "doc_id") == "0:0"
