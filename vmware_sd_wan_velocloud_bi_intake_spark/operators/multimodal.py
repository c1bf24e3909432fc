"""Multimodal column support: opaque binary payloads + typed metadata.

Beyond-reference surface (SURVEY.md §7 step 10). Media rides through the
engine as ``binary`` content plus a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
operators so the heavy per-item work stays columnar and partition-parallel.

The actual image/audio codecs are NOT in this environment, so the decode
step is stubbed: ``decode_media`` raises ``NotImplementedError`` unless a
decoder is injected. Everything around it — schema, batch shape, UDF
signatures, frame-index math, partitioning — is real and tested with a
deterministic fake decoder.

Scale notes: media rows are large and skew-prone; ``repartition`` by a
size-aware bucket before decode keeps tasks balanced, and features (small)
are split from content (large) immediately after extraction so downstream
shuffles never move raw bytes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("codec", T.StringType()),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, byte_mean double, byte_hist array<long>"
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a (media_id, content: binary, meta) table from any source column.

    Used by tests to fabricate deterministic payloads; in production the
    binary column arrives from the lake (parquet/avro binary fields).
    """
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("string").alias("codec"),
        ).alias("meta"),
    )


def fake_decoder(content: bytes) -> dict:
    """Deterministic stand-in for a codec: byte statistics as 'features'."""
    import numpy as np

    arr = np.frombuffer(content, dtype=np.uint8)
    hist = np.bincount(arr % 16, minlength=16).astype("int64")
    return {
        "n_bytes": int(arr.size),
        "byte_mean": float(arr.mean()) if arr.size else 0.0,
        "byte_hist": hist.tolist(),
    }


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """Decode + feature-extract per media item via Arrow-batched UDF.

    ``decoder`` maps raw bytes → feature dict. Without one this raises
    ``NotImplementedError`` at plan-build time (the codecs are not available
    in this environment — inject ``fake_decoder`` for plumbing tests, or a
    PIL/ffmpeg-backed decoder in production).
    """
    import pandas as pd

    if decoder is None:
        raise NotImplementedError(
            "media decoding requires a codec library (PIL/ffmpeg) not present "
            "in this environment; inject decoder=fake_decoder for plumbing "
            "tests or a real codec in production"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(bytes(b)) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "byte_mean": [f["byte_mean"] for f in feats],
                    "byte_hist": [f["byte_hist"] for f in feats],
                }
            )

    # features are tiny relative to content: project content away immediately
    # after this operator; never shuffle raw bytes downstream.
    return media.select("media_id", "content").mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, content binary, "
    "meta struct<mime string, width int, height int, duration_ms long, codec string>"
)


def fake_resizer(content: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resizer: size-proportional
    truncation/padding of the payload (real codecs aren't in this env)."""
    target = max(1, (width * height) // 64)
    if len(content) >= target:
        return content[:target]
    return content + b"\x00" * (target - len(content))


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize every media item to (width, height) via Arrow-batched UDF.

    Same contract as :func:`extract_features`: ``resizer`` maps
    (bytes, w, h) → bytes; without one this raises ``NotImplementedError``
    at plan-build time (inject ``fake_resizer`` for plumbing tests, a
    PIL/ffmpeg-backed resizer in production). Output keeps the
    (media_id, content, meta) shape with meta.width/height updated, so
    resize composes with decode/feature stages. Content stays partitioned
    where it was read — resizing is pure map work, no shuffle.
    """
    import pandas as pd

    if resizer is None:
        raise NotImplementedError(
            "media resizing requires a codec library (PIL/ffmpeg) not present "
            "in this environment; inject resizer=fake_resizer for plumbing "
            "tests or a real codec in production"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for m in pdf["meta"]:
                m = dict(m) if m is not None else {}
                m["width"], m["height"] = width, height
                metas.append(m)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "content": [resizer(bytes(b), width, height) for b in pdf["content"]],
                    "meta": metas,
                }
            )

    return media.select("media_id", "content", "meta").mapInPandas(
        run, RESIZED_SCHEMA
    )


def frame_sample_indices(
    duration_ms: Column, fps: float = 1.0, max_frames: int = 16
) -> Column:
    """Frame-sampling plan: evenly spaced frame timestamps (ms) per video.

    Pure expression (no UDF): ``sequence`` over the duration with a stride
    derived from fps, capped at ``max_frames`` — the sampling *plan* that a
    decode UDF would consume.
    """
    stride = F.greatest(
        F.lit(int(1000 / fps)),
        (duration_ms / F.lit(max_frames)).cast("long"),
    )
    return F.when(
        duration_ms.isNull() | (duration_ms <= 0), F.array().cast("array<long>")
    ).otherwise(F.sequence(F.lit(0).cast("long"), duration_ms - 1, stride))
