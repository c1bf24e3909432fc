"""Versioned dataset snapshots — reproducible training data, lakehouse-lite.

A training run must be able to pin EXACTLY the bytes it trained on while
the pipeline keeps publishing newer curations. This module gives any
DataFrame a Delta/Iceberg-style linear version history with nothing but
parquet + one atomically-renamed pointer file:

    root/
      v=1/ …parquet…          (immutable once published)
      v=2/ …parquet…
      _v2.commit              (manifest: version, rows, schema, note)
      _latest                 (atomic pointer: "2")

Publish protocol (crash-safe at every step, the `swap_into_place`
discipline from sinks/upsert.py):
1. write the data dir ``v=N`` (a crash here leaves an orphan dir that no
   pointer references — invisible to readers, reclaimed by the next
   publish to the same N);
2. write the manifest ``_vN.commit`` via tmp+rename (readers treat a
   version without its manifest as unpublished);
3. rename ``_latest`` over the previous pointer — the single atomic
   commit point.

Readers either pin a version (training reproducibility) or follow
``_latest`` (the pipeline default); a reader mid-publish sees the old
pointer until step 3 lands, and never a partial directory. Old versions
are immutable — `prune_versions` is the explicit, separate destructor
(keep-last-K), mirroring VACUUM.

Scale: the pointer/manifest protocol is O(1) driver-side file ops per
publish; data writes are ordinary partition-parallel parquet. On object
stores without atomic rename, point ``root`` at a rename-capable FS or a
small consistent prefix (the same caveat every manifest-based table
format documents).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from ..functions.artifacts import atomic_write_text


def _pointer(root: str) -> str:
    return os.path.join(root, "_latest")


def _manifest(root: str, version: int) -> str:
    return os.path.join(root, f"_v{version}.commit")


def _data_dir(root: str, version: int) -> str:
    return os.path.join(root, f"v={version}")


def latest_version(root: str) -> int | None:
    """Published head, or None for an empty/new root."""
    try:
        with open(_pointer(root)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def list_versions(root: str) -> list[dict]:
    """Manifests of every PUBLISHED version, ascending.

    Published = manifest exists AND version ≤ the ``_latest`` pointer —
    the pointer rename is the commit point, so a manifest written by a
    publish that crashed BEFORE its pointer rename is an uncommitted
    orphan (the next publish reclaims its number and may rewrite its
    bytes); exposing it would let a reader pin data that is not yet
    immutable."""
    if not os.path.isdir(root):
        return []
    head = latest_version(root)
    if head is None:
        return []
    out = []
    for name in os.listdir(root):
        if name.startswith("_v") and name.endswith(".commit"):
            with open(os.path.join(root, name)) as f:
                m = json.load(f)
            if m["version"] <= head:
                out.append(m)
    return sorted(out, key=lambda m: m["version"])


def write_version(
    df: DataFrame,
    root: str,
    note: str = "",
    profile: list[dict] | None = None,
) -> int:
    """Publish ``df`` as the next version; returns the version number.

    Versions are linear: next = latest + 1. A crashed previous attempt at
    the same number (orphan dir, no manifest) is overwritten — it was
    never visible. The pointer rename is the commit point.

    ``profile`` (optional) is the release's ``profile_table`` output as a
    list of plain dicts; it is embedded in the manifest so the NEXT
    release's expectation gate can evaluate drift rules (row-count ratio,
    null-frac delta, ndv ratio) against this one — O(columns) JSON, not
    data.
    """
    os.makedirs(root, exist_ok=True)
    head = latest_version(root)
    version = (head or 0) + 1
    data = _data_dir(root, version)
    df.write.mode("overwrite").parquet(data)
    n_rows = df.sparkSession.read.parquet(data).count()
    manifest = {
        "version": version,
        "rows": int(n_rows),
        "schema": df.schema.simpleString(),
        "note": note,
    }
    if profile is not None:
        manifest["profile"] = profile
    atomic_write_text(_manifest(root, version), json.dumps(manifest))
    atomic_write_text(_pointer(root), str(version))
    return version


def version_profile(root: str, version: int | None = None) -> list[dict] | None:
    """The profile embedded in a PUBLISHED version's manifest (head by
    default), or None when the version exists without one (pre-profile
    publishes) or there are no published versions — callers treat None as
    'no drift baseline'."""
    head = latest_version(root)
    if version is None:
        version = head
    if version is None or head is None or version > head:
        return None
    try:
        with open(_manifest(root, version)) as f:
            return json.load(f).get("profile")
    except FileNotFoundError:
        return None


def read_version(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read a pinned version (training reproducibility) or the published
    head. Unpublished versions are refused: without the manifest it never
    wrote completely, and without the pointer having reached it the
    publish never COMMITTED — its number can be reclaimed and its bytes
    rewritten by the next publish, so pinning it would not be
    reproducible."""
    head = latest_version(root)
    if version is None:
        version = head
        if version is None:
            raise FileNotFoundError(f"no published versions under {root}")
    if (
        head is None
        or version > head
        or not os.path.exists(_manifest(root, version))
    ):
        raise FileNotFoundError(
            f"version {version} is not published under {root}"
        )
    return spark.read.parquet(_data_dir(root, version))


def prune_versions(root: str, keep_last: int = 3) -> list[int]:
    """Drop all but the newest ``keep_last`` published versions (explicit
    VACUUM — never implicit). The head is always kept. Returns the pruned
    version numbers. Manifest is removed FIRST (unpublish), then the data
    dir — a crash between the two leaves an orphan dir, which readers
    already ignore."""
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = [m["version"] for m in list_versions(root)]
    doomed = versions[:-keep_last] if len(versions) > keep_last else []
    for v in doomed:
        os.remove(_manifest(root, v))
        shutil.rmtree(_data_dir(root, v), ignore_errors=True)
    return doomed
