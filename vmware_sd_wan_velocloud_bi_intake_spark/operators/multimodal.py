"""Multimodal column support: opaque binary payloads + typed metadata.

Beyond-reference surface (SURVEY.md §7 step 10). Media rides through the
engine as ``binary`` content plus a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
operators so the heavy per-item work stays columnar and partition-parallel.

Decode is REAL for the formats a pure-Python decoder can carry: binary PPM
(P6), uncompressed 24-bit BMP, and 8-bit PNG (stdlib ``zlib`` inflate +
all five scanline unfilters — the most common web-corpus image format
needs no codec library) decode to actual pixel bytes (:func:`ppm_decode` /
:func:`bmp_decode` / :func:`png_decode`, dispatched by magic bytes in
:func:`decode_media`), and PPM resizes through a real nearest-neighbor
resampler (:func:`ppm_resize`). JPEG/WebP (and 16-bit/interlaced PNG
exotics) decode and resize
automatically whenever Pillow is importable (optional dependency — the
engine never requires it); PCM WAV audio decodes through the stdlib
``wave`` container (:func:`wav_decode` → :func:`extract_audio_features`,
real signal statistics over decoded samples); uncompressed-DIB AVI video
demuxes and decodes pure-Python (:func:`avi_decode` →
:func:`sample_video_frames`, emitting PPM frames the image operators
consume directly; MJPEG frames ride the Pillow boundary). In a PIL-less
environment like this one, remaining image formats — and compressed
audio/video codecs — raise ``NotImplementedError`` unless a decoder is
injected. The schema, batch shape, UDF signatures,
frame-index math, and partitioning are shared by every path and tested
with real pixels where possible.

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


def ppm_decode(content: bytes) -> dict:
    """Pure-Python binary-PPM (P6) decoder → real pixel bytes.

    Parses the netpbm header (magic, whitespace/comment-tolerant width,
    height, maxval tokens, single whitespace, then the RGB raster) and
    returns ``{"width", "height", "maxval", "pixels": bytes}`` with pixels
    in row-major RGB order — the actual image content, not a stand-in.
    """
    if not content.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    idx, vals = 2, []
    while len(vals) < 3:
        while idx < len(content) and content[idx : idx + 1].isspace():
            idx += 1
        if content[idx : idx + 1] == b"#":  # comment runs to end of line
            while idx < len(content) and content[idx] != 0x0A:
                idx += 1
            continue
        start = idx
        while idx < len(content) and not content[idx : idx + 1].isspace():
            idx += 1
        if start == idx:
            raise ValueError("truncated PPM header")
        vals.append(int(content[start:idx]))
    idx += 1  # exactly one whitespace byte separates maxval from the raster
    width, height, maxval = vals
    if not 1 <= maxval <= 255:
        # netpbm permits maxval up to 65535 (2 bytes per sample); decoding
        # that as 1-byte samples would return confidently wrong pixels
        raise NotImplementedError(
            f"only 1-byte-per-sample PPM is supported (maxval={maxval})"
        )
    n = width * height * 3
    pixels = content[idx : idx + n]
    if len(pixels) < n:
        raise ValueError(f"truncated PPM raster: {len(pixels)} < {n} bytes")
    return {"width": width, "height": height, "maxval": maxval, "pixels": pixels}


def ppm_encode(width: int, height: int, pixels: bytes, maxval: int = 255) -> bytes:
    """Inverse of :func:`ppm_decode` (canonical single-newline header)."""
    return b"P6\n%d %d\n%d\n" % (width, height, maxval) + pixels


def bmp_decode(content: bytes) -> dict:
    """Pure-Python uncompressed 24-bit BMP decoder → real pixel bytes.

    Parses BITMAPFILEHEADER + BITMAPINFOHEADER, honors 4-byte row padding
    and bottom-up (or top-down, negative-height) row order, and returns
    pixels row-major top-down in RGB order (BMP stores BGR).
    """
    import struct

    if not content.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", content, 10)[0]
    width = struct.unpack_from("<i", content, 18)[0]
    height = struct.unpack_from("<i", content, 22)[0]
    bpp = struct.unpack_from("<H", content, 28)[0]
    compression = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP is supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = height < 0
    height = abs(height)
    out = _dib_to_rgb(content[offset:], width, height, top_down=top_down)
    return {"width": width, "height": height, "maxval": 255, "pixels": bytes(out)}


def _paeth(a: int, b: int, c: int) -> int:
    # PNG spec predictor: nearest of (left, up, up-left) to a + b − c,
    # ties broken left → up → up-left
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_decode(content: bytes) -> dict:
    """Stdlib-only PNG decoder → real pixel bytes (no Pillow, no codec
    libs): chunk walk, ``zlib`` IDAT inflate, per-scanline unfilter (all
    five spec filters — None/Sub/Up/Average/Paeth), channel conversion to
    row-major RGB. Supports the dominant web-corpus shape: 8-bit depth,
    color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA —
    alpha dropped, matching Pillow's ``convert("RGB")``), no interlace.
    16-bit and Adam7 payloads raise ``NotImplementedError`` (decode those
    via the optional Pillow path or an injected decoder).

    The unfilter loop is per-byte Python — right for the engine's
    Arrow-batched feature UDFs over test/report-sized images; route bulk
    decode through an injected codec library in production (the
    documented :func:`extract_features` contract).
    """
    import struct
    import zlib

    if not content.startswith(b"\x89PNG\r\n\x1a\n"):
        raise ValueError("not a PNG payload")
    pos, idat, plte, hdr = 8, bytearray(), None, None
    while pos + 8 <= len(content):
        length, ctype = struct.unpack_from(">I4s", content, pos)
        data = content[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + payload + crc
        if ctype == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if hdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = hdr
    if comp != 0 or filt != 0:
        raise ValueError(f"bad PNG compression/filter method ({comp}/{filt})")
    if depth != 8 or interlace != 0 or color not in (0, 2, 3, 4, 6):
        raise NotImplementedError(
            f"png_decode supports 8-bit non-interlaced color types "
            f"0/2/3/4/6 (got depth={depth}, color={color}, "
            f"interlace={interlace})"
        )
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"PNG raster size mismatch: {len(raw)} != {h * (stride + 1)}"
        )
    out = bytearray(h * stride)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        prev = out[(y - 1) * stride : y * stride] if y else bytes(stride)
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG scanline filter {f}")
        out[y * stride : (y + 1) * stride] = line
    if color == 2:
        pixels = bytes(out)
    elif color == 6:  # RGBA → RGB (drop alpha, Pillow convert('RGB') rule)
        pixels = bytes(b for i, b in enumerate(out) if i % 4 != 3)
    elif color == 0:  # gray → replicate
        pixels = bytes(b for b in out for _ in range(3))
    elif color == 4:  # gray+alpha → replicate the gray byte
        pixels = bytes(out[i] for i in range(0, len(out), 2) for _ in range(3))
    else:  # palette
        pixels = bytes(
            plte[3 * idx + k] for idx in out for k in range(3)
        )
    return {"width": w, "height": h, "maxval": 255, "pixels": pixels}


def png_encode(width: int, height: int, pixels: bytes, filter_type: int = 0) -> bytes:
    """Minimal stdlib RGB PNG writer (single IDAT, one filter for every
    scanline) — the round-trip partner :func:`png_decode`'s tests drive
    through all five filters; also a real PNG any viewer opens."""
    import struct
    import zlib

    if len(pixels) != width * height * 3:
        raise ValueError("png_encode: pixels must be RGB row-major")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    stride = width * 3
    raw = bytearray()
    for y in range(height):
        line = bytearray(pixels[y * stride : (y + 1) * stride])
        prev = pixels[(y - 1) * stride : y * stride] if y else bytes(stride)
        enc = bytearray(line)
        if filter_type == 1:
            for i in range(stride - 1, 2, -1):
                enc[i] = (line[i] - line[i - 3]) & 0xFF
        elif filter_type == 2:
            for i in range(stride):
                enc[i] = (line[i] - prev[i]) & 0xFF
        elif filter_type == 3:
            for i in range(stride):
                left = line[i - 3] if i >= 3 else 0
                enc[i] = (line[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif filter_type == 4:
            for i in range(stride):
                left = line[i - 3] if i >= 3 else 0
                ul = prev[i - 3] if i >= 3 else 0
                enc[i] = (line[i] - _paeth(left, prev[i], ul)) & 0xFF
        elif filter_type != 0:
            raise ValueError(f"bad filter {filter_type}")
        raw.append(filter_type)
        raw += enc
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _pil_rgb(content: bytes):
    """The ONE Pillow boundary: bytes → RGB Image, or None when Pillow is
    absent or cannot identify the payload. Every PIL-optional path
    (decode, resize) goes through here so the availability/dispatch
    contract cannot drift between call sites."""
    try:
        from PIL import Image, UnidentifiedImageError
    except ImportError:
        return None
    import io

    try:
        with Image.open(io.BytesIO(content)) as im:
            return im.convert("RGB")
    except UnidentifiedImageError:
        return None


def _pil_decode(content: bytes) -> dict | None:
    """Pillow-backed decode (JPEG/PNG/…) when PIL is importable.

    Returns the same ``{"width","height","maxval","pixels"}`` contract as
    the pure-Python decoders (RGB, row-major), or ``None`` when Pillow is
    absent or cannot identify the payload — callers then fall through to
    the documented ``NotImplementedError`` contract, so environments
    without codec libraries behave exactly as before.
    """
    rgb = _pil_rgb(content)
    if rgb is None:
        return None
    return {
        "width": rgb.width,
        "height": rgb.height,
        "maxval": 255,
        "pixels": rgb.tobytes(),
    }


def decode_media(content: bytes) -> dict:
    """Magic-byte-dispatched decode to real pixels for supported formats.

    P6 → :func:`ppm_decode`; BM → :func:`bmp_decode`; PNG →
    :func:`png_decode` (stdlib zlib — no Pillow needed for the most
    common web-corpus image format; 16-bit/Adam7 exotics fall through to
    Pillow when importable); anything else tries Pillow if it is
    importable (:func:`_pil_decode` — JPEG/WebP/… with no injection
    needed). Only when no decoder applies does this raise
    ``NotImplementedError`` — audio/video (and JPEG in a PIL-less
    environment like this one) still need a decoder injected into
    :func:`extract_features` in production.
    """
    if content.startswith(b"P6"):
        return ppm_decode(content)
    if content.startswith(b"BM"):
        return bmp_decode(content)
    if content.startswith(b"\x89PNG\r\n\x1a\n"):
        try:
            return png_decode(content)
        except NotImplementedError:
            img = _pil_decode(content)
            if img is not None:
                return img
            raise
    img = _pil_decode(content)
    if img is not None:
        return img
    raise NotImplementedError(
        "no decoder for this payload (built-ins: PPM P6, 24-bit BMP, "
        "8-bit PNG; JPEG decodes automatically when Pillow is installed); "
        "inject a codec-backed decoder for other formats"
    )


def pixel_feature_decoder(content: bytes) -> dict:
    """Default feature decoder: byte statistics over DECODED pixels.

    Same output contract as :func:`fake_decoder`, but the statistics are
    computed on the actual decoded raster (via :func:`decode_media`), not
    on the raw container bytes.
    """
    import numpy as np

    img = decode_media(content)
    arr = np.frombuffer(img["pixels"], dtype=np.uint8)
    hist = np.bincount(arr % 16, minlength=16).astype("int64")
    return {
        "n_bytes": int(arr.size),
        "byte_mean": float(arr.mean()) if arr.size else 0.0,
        "byte_hist": hist.tolist(),
    }


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

    ``decoder`` maps raw bytes → feature dict. The default is
    :func:`pixel_feature_decoder` — REAL decode for PPM/BMP payloads
    (statistics over actual decoded pixels), ``NotImplementedError`` per
    item for formats that need an absent codec library (inject a
    PIL/ffmpeg-backed decoder for those in production, or
    ``fake_decoder`` for format-agnostic plumbing tests).
    """
    import pandas as pd

    if decoder is None:
        decoder = pixel_feature_decoder

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


def ppm_resize(content: bytes, width: int, height: int) -> bytes:
    """Real nearest-neighbor resize for binary-PPM payloads (pure Python).

    Decodes, resamples the raster with integer nearest-neighbor mapping,
    re-encodes P6 — an actual image transformation, byte-checkable.
    """
    img = ppm_decode(content)
    sw, sh, px = img["width"], img["height"], img["pixels"]
    out = bytearray()
    for y in range(height):
        sy = min(sh - 1, (y * sh) // height)
        row_base = sy * sw
        for x in range(width):
            sx = min(sw - 1, (x * sw) // width)
            o = (row_base + sx) * 3
            out += px[o : o + 3]
    return ppm_encode(width, height, bytes(out), img["maxval"])


def builtin_resizer(content: bytes, width: int, height: int) -> bytes:
    """Magic-dispatched resize: PPM resizes for real; other image formats
    resize through Pillow when it is importable (decode → NEAREST resample
    → re-encode as canonical P6, so the output stays decodable by the
    engine's own built-ins); otherwise an injected codec-backed resizer is
    required."""
    if content.startswith(b"P6"):
        return ppm_resize(content, width, height)
    rgb = _pil_rgb(content)
    if rgb is not None:
        from PIL import Image

        out = rgb.resize((width, height), Image.Resampling.NEAREST)
        return ppm_encode(width, height, out.tobytes())
    raise NotImplementedError(
        "no resizer for this payload (built-in: PPM P6; other image "
        "formats resize automatically when Pillow is installed); inject a "
        "codec-backed resizer for other formats"
    )


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize every media item to (width, height) via Arrow-batched UDF.

    Same contract as :func:`extract_features`: ``resizer`` maps
    (bytes, w, h) → bytes; the default :func:`builtin_resizer` resizes PPM
    payloads for real (nearest-neighbor) and raises ``NotImplementedError``
    per item for formats needing an absent codec library (inject
    ``fake_resizer`` for format-agnostic plumbing tests, a PIL/ffmpeg-
    backed resizer in production). Output keeps the (media_id, content,
    meta) shape with meta.width/height updated, so resize composes with
    decode/feature stages. Content stays partitioned where it was read —
    resizing is pure map work, no shuffle.
    """
    import pandas as pd

    if resizer is None:
        resizer = builtin_resizer

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


def wav_decode(content: bytes) -> dict:
    """REAL audio decode for PCM WAV containers — pure stdlib (``wave``),
    no codec library. Returns sample_rate, n_channels, sample_width,
    n_samples, duration_ms, and the raw PCM frame bytes."""
    import io
    import wave

    if not (content[:4] == b"RIFF" and content[8:12] == b"WAVE"):
        raise NotImplementedError(
            "not a RIFF/WAVE payload; inject a codec-backed decoder for "
            "compressed audio (mp3/ogg/flac)"
        )
    with wave.open(io.BytesIO(content), "rb") as w:
        n = w.getnframes()
        rate = w.getframerate()
        return {
            "sample_rate": rate,
            "n_channels": w.getnchannels(),
            "sample_width": w.getsampwidth(),
            "n_samples": n,
            "duration_ms": int(n * 1000 / rate) if rate else 0,
            "pcm": w.readframes(n),
        }


def wav_encode(
    samples, sample_rate: int = 16000, n_channels: int = 1
) -> bytes:
    """Build a 16-bit PCM WAV payload from an int16 iterable (fixture
    builder for tests and the deterministic synthetic-audio path)."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    arr = np.asarray(samples, dtype="<i2")
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


AUDIO_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, n_channels int, duration_ms long, "
    "rms double, peak int, zero_crossings long"
)


def audio_feature_decoder(content: bytes) -> dict:
    """Signal statistics over DECODED samples (16-bit PCM): RMS, peak,
    zero-crossing count — the audio analog of :func:`pixel_feature_decoder`."""
    import numpy as np

    a = wav_decode(content)
    if a["sample_width"] != 2:
        raise NotImplementedError("audio features support 16-bit PCM only")
    x = np.frombuffer(a["pcm"], dtype="<i2").astype("float64")
    # crossings must be counted per channel on the de-interleaved signal:
    # adjacent samples of the raw PCM stream alternate channels, and a
    # sign flip between channels is not a crossing of either
    nc = max(1, a["n_channels"])
    ch = x[: (x.size // nc) * nc].reshape(-1, nc)
    zc = int(((ch[:-1] * ch[1:]) < 0).sum()) if ch.shape[0] > 1 else 0
    return {
        "sample_rate": a["sample_rate"],
        "n_channels": a["n_channels"],
        "duration_ms": a["duration_ms"],
        "rms": float(np.sqrt((x * x).mean())) if x.size else 0.0,
        "peak": int(np.abs(x).max()) if x.size else 0,
        "zero_crossings": zc,
    }


def extract_audio_features(
    media: DataFrame,
    decoder: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """Arrow-batched audio feature extraction — same plumbing contract as
    :func:`extract_features` (map-only, content projected away after)."""
    import pandas as pd

    if decoder is None:
        decoder = audio_feature_decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(bytes(b)) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    **{
                        k: [f[k] for f in feats]
                        for k in (
                            "sample_rate",
                            "n_channels",
                            "duration_ms",
                            "rms",
                            "peak",
                            "zero_crossings",
                        )
                    },
                }
            )

    return media.select("media_id", "content").mapInPandas(
        run, AUDIO_FEATURE_SCHEMA
    )


def _dib_to_rgb(
    raster: bytes, width: int, height: int, top_down: bool = False
) -> bytes:
    """Padded BGR DIB raster (the BMP / AVI '00db' frame format) → top-down
    RGB. The ONE copy of the stride/padding conversion — :func:`bmp_decode`
    and :func:`avi_decode` both route through it."""
    row_size = (width * 3 + 3) & ~3
    out = bytearray(width * height * 3)
    for row in range(height):
        src_row = row if top_down else height - 1 - row
        start = src_row * row_size
        rowbytes = raster[start : start + width * 3]
        if len(rowbytes) < width * 3:
            raise ValueError("truncated DIB raster")
        # BGR → RGB via strided slice assignment — no per-pixel objects
        base = row * width * 3
        out[base + 0 : base + width * 3 : 3] = rowbytes[2::3]
        out[base + 1 : base + width * 3 : 3] = rowbytes[1::3]
        out[base + 2 : base + width * 3 : 3] = rowbytes[0::3]
    return bytes(out)


def _rgb_to_dib(pixels: bytes, width: int, height: int) -> bytes:
    row_size = (width * 3 + 3) & ~3
    out = bytearray(row_size * height)
    for row in range(height):
        src = (height - 1 - row) * width * 3
        rowbytes = pixels[src : src + width * 3]
        base = row * row_size
        out[base + 0 : base + width * 3 : 3] = rowbytes[2::3]
        out[base + 1 : base + width * 3 : 3] = rowbytes[1::3]
        out[base + 2 : base + width * 3 : 3] = rowbytes[0::3]
    return bytes(out)


def avi_decode(content: bytes) -> dict:
    """Pure-Python RIFF/AVI demux + frame decode.

    Walks the RIFF chunk tree, reads the ``avih`` main header for
    geometry/timing, and decodes every ``..db`` (uncompressed DIB) frame
    to a top-down RGB raster; ``..dc`` (MJPEG) frames decode through the
    optional Pillow boundary. Compressed streams without Pillow raise the
    documented ``NotImplementedError``.

    Returns {width, height, fps, duration_ms, frames: [RGB bytes]}.
    """
    import struct

    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise NotImplementedError(
            "not a RIFF/AVI payload; inject a codec-backed decoder for "
            "other video containers"
        )
    avih = None
    frames: list[tuple[bytes, bytes]] = []  # (kind, chunk payload)

    def walk(buf: bytes, pos: int, end: int):
        nonlocal avih
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            size = struct.unpack_from("<I", buf, pos + 4)[0]
            body = pos + 8
            if fourcc == b"LIST":
                walk(buf, body + 4, body + size)  # skip the list type tag
            elif fourcc == b"avih":
                avih = buf[body : body + size]
            elif fourcc[2:4] in (b"db", b"dc"):
                frames.append((fourcc[2:4], buf[body : body + size]))
            pos = body + size + (size & 1)  # chunks pad to even offsets

    walk(content, 12, len(content))
    if avih is None:
        raise ValueError("AVI has no avih header")
    usec_pf = struct.unpack_from("<I", avih, 0)[0]
    width = struct.unpack_from("<I", avih, 32)[0]
    height = struct.unpack_from("<I", avih, 36)[0]
    rgb_frames = []
    for kind, payload in frames:
        if kind == b"db":
            rgb_frames.append(_dib_to_rgb(payload, width, height))
        else:  # MJPEG
            rgb = _pil_rgb(payload)
            if rgb is None:
                raise NotImplementedError(
                    "MJPEG AVI frames need Pillow (or an injected decoder)"
                )
            if (rgb.width, rgb.height) != (width, height):
                # the '..db' path validates via _dib_to_rgb; an unchecked
                # JPEG-vs-avih mismatch would feed row-misaligned pixels
                # to every downstream consumer with no error
                raise ValueError(
                    f"MJPEG frame is {rgb.width}x{rgb.height} but avih "
                    f"declares {width}x{height}"
                )
            rgb_frames.append(rgb.tobytes())
    fps = 1_000_000 / usec_pf if usec_pf else 0.0
    return {
        "width": width,
        "height": height,
        "fps": fps,
        "duration_ms": int(len(rgb_frames) * (usec_pf / 1000)),
        "frames": rgb_frames,
    }


def avi_encode(
    frames: list[bytes], width: int, height: int, fps: float = 10.0
) -> bytes:
    """Minimal uncompressed-DIB AVI writer (fixture builder + synthetic
    video path): RIFF(hdrl(avih, strl(strh, strf)), movi('00db'...))."""
    import struct

    usec_pf = int(1_000_000 / fps)
    dibs = [_rgb_to_dib(f, width, height) for f in frames]
    frame_size = len(dibs[0]) if dibs else 0

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    avih = struct.pack(
        "<14I",
        usec_pf, frame_size * int(fps), 0, 0x10, len(dibs), 0, 1,
        frame_size, width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        # dwScale=1, dwRate=fps → rate/scale is the frame rate
        b"vids", b"DIB ", 0, 0, 0, 0, 1,
        int(fps), 0, len(dibs), frame_size, 0, 0, 0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, frame_size, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00db", d) for d in dibs))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


VIDEO_FRAME_SCHEMA = (
    "media_id long, frame_idx int, ts_ms long, width int, height int, "
    "frame binary"
)


def sample_video_frames(
    media: DataFrame,
    fps: float = 1.0,
    max_frames: int = 16,
    decoder: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """Evenly-spaced frame sampling over a video column — the execution of
    the :func:`frame_sample_indices` plan: decode the container, keep the
    frame nearest each sampled timestamp, emit one row per kept frame as
    a PPM payload (so downstream image operators — `extract_features`,
    `resize_media` — consume frames with no extra plumbing). Map-only."""
    import pandas as pd

    if decoder is None:
        decoder = avi_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "frame_idx", "ts_ms", "width", "height", "frame"
            )}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                v = decoder(bytes(content))
                n = len(v["frames"])
                if n == 0 or v["fps"] <= 0:
                    continue
                frame_ms = 1000.0 / v["fps"]
                dur = int(n * frame_ms)
                # CEILING division: floor makes range() overshoot the cap
                # by one (17 s at max 16 -> stride 1062 -> 17 samples)
                stride = max(int(1000 / fps), -(-dur // max_frames))
                for ts in range(0, dur, stride):
                    idx = min(int(ts / frame_ms), n - 1)
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["ts_ms"].append(ts)
                    rows["width"].append(v["width"])
                    rows["height"].append(v["height"])
                    rows["frame"].append(
                        ppm_encode(v["width"], v["height"], v["frames"][idx])
                    )
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(
        run, VIDEO_FRAME_SCHEMA
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
        # ceiling, not floor: a floor stride lets sequence() emit
        # max_frames+1 timestamps when duration isn't a multiple
        F.ceil(duration_ms / F.lit(max_frames)).cast("long"),
    )
    return F.when(
        duration_ms.isNull() | (duration_ms <= 0), F.array().cast("array<long>")
    ).otherwise(F.sequence(F.lit(0).cast("long"), duration_ms - 1, stride))
