"""Multimodal binary-column plumbing: schema, batch UDF shape, frame plan.
The codec itself is stubbed (not available here) — the Spark-side contract
is what's under test."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
    fake_decoder,
    frame_sample_indices,
)
from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table


def test_binary_payload_schema(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    media = attach_binary_payload(docs, "doc_id", "text")
    assert dict(media.dtypes)["content"] == "binary"
    assert media.count() == docs.count()


def test_extract_features_with_fake_decoder(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(50)
    media = attach_binary_payload(docs, "doc_id", "text")
    feats = extract_features(media, decoder=fake_decoder)
    rows = feats.collect()
    assert len(rows) == 50
    r = {row["media_id"]: row for row in rows}
    # features must agree with a driver-side decode of the same bytes
    sample = docs.select("doc_id", "text").limit(5).collect()
    for s in sample:
        expected = fake_decoder(s["text"].encode("utf-8"))
        got = r[s["doc_id"]]
        assert got["n_bytes"] == expected["n_bytes"]
        assert abs(got["byte_mean"] - expected["byte_mean"]) < 1e-12
        assert list(got["byte_hist"]) == expected["byte_hist"]


def test_extract_features_requires_decoder(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(1)
    media = attach_binary_payload(docs, "doc_id", "text")
    with pytest.raises(NotImplementedError):
        extract_features(media)


def test_frame_sample_indices(spark):
    df = spark.createDataFrame(
        [(1, 10_000), (2, 0), (3, None)], "vid int, duration_ms long"
    )
    out = df.select(
        "vid",
        frame_sample_indices(F.col("duration_ms"), fps=1.0, max_frames=16).alias(
            "frames"
        ),
    ).collect()
    frames = {r["vid"]: r["frames"] for r in out}
    assert frames[1] == [0, 1000, 2000, 3000, 4000, 5000, 6000, 7000, 8000, 9000]
    assert frames[2] == []
    assert frames[3] == []


def test_resize_media_with_fake_resizer(spark, sf_smoke):
    from vmware_sd_wan_velocloud_bi_intake_spark.operators.multimodal import (
        attach_binary_payload,
        fake_resizer,
        resize_media,
    )
    from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(20)
    media = attach_binary_payload(docs, "doc_id", "text")
    out = resize_media(media, 32, 16, resizer=fake_resizer)
    rows = out.collect()
    assert len(rows) == 20
    target = (32 * 16) // 64
    for r in rows:
        assert len(r["content"]) == target
        assert r["meta"]["width"] == 32 and r["meta"]["height"] == 16
        assert r["meta"]["mime"] == "application/octet-stream"  # rest of meta preserved


def test_resize_media_requires_resizer(spark, sf_smoke):
    import pytest as _pytest

    from vmware_sd_wan_velocloud_bi_intake_spark.operators.multimodal import (
        attach_binary_payload,
        resize_media,
    )
    from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(1)
    media = attach_binary_payload(docs, "doc_id", "text")
    with _pytest.raises(NotImplementedError):
        resize_media(media, 8, 8)
