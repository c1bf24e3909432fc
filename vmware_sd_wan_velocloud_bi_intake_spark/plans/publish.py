"""Curate → gate → publish: the training-corpus release pipeline.

Composes the engine's curation DAG (plans/curation.py), the data-quality
expectation gate (plans/expectations.py), and the versioned snapshot sink
(sinks/versioned.py) into the one call a corpus-release job runs:

1. curate the raw documents (redact → heuristic/LM gates → exact + near +
   passage dedup — every stage individually tested and scale-measured);
2. profile the CURATED output (one scan) and enforce the caller's
   expectations — a release that would ship a nulled-out id column or a
   collapsed corpus fails HERE, with every violation in one report, and
   publishes nothing;
3. publish an immutable snapshot version; training runs pin it while the
   next release cycle republishes.

The gate sits between curation and publish on purpose: violations cost
one profile scan, never a write, and a half-written rejected version
cannot exist (write_version only runs after the gate passes, and its own
pointer protocol makes a crashed publish invisible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.profile import profile_table
from ..sinks.versioned import version_profile, write_version
from .curation import curate_corpus
from .expectations import enforce_expectations


DEFAULT_RULES = [
    # the floor any corpus release must clear: rows exist, ids are ids —
    # plus the drift floor: a release may not silently drop more than half
    # its rows or go nullier vs the previous version (relative rules are
    # skipped for v1 / pre-profile baselines — absolute rules bootstrap)
    {
        "column": "doc_id",
        "min_rows": 1,
        "max_null_frac": 0.0,
        "min_ndv": 1,
        "min_row_ratio": 0.5,
    },
    {"column": "text", "max_null_frac": 0.0, "max_null_frac_delta": 0.0},
]


def publish_curated_version(
    docs: DataFrame,
    root: str,
    *,
    rules: list[dict] | None = None,
    note: str = "",
    **curate_kwargs,
) -> int:
    """Run the full release pipeline; returns the published version.

    ``rules`` defaults to :data:`DEFAULT_RULES` (corpus-specific releases
    should pass stronger ones — expected row-count floors, cardinality
    bounds, width ceilings). ``curate_kwargs`` pass through to
    :func:`~.curation.curate_corpus`. Raises
    :class:`~.expectations.ExpectationError` (publishing nothing) when
    the curated output violates the rules; the curation caches are
    released on every path.

    Drift awareness: the gate also evaluates the rules' RELATIVE clauses
    against the previous published version's profile (stored in its
    manifest), and this release's profile is embedded in the new manifest
    for the next cycle — so a release that clears every absolute floor
    but halves its row count vs v(N−1) publishes nothing. The profile is
    collected once and reused for the gate and the manifest.
    """
    res = curate_corpus(docs, **curate_kwargs)
    try:
        return _gate_and_publish(res.curated, root, rules, note)
    finally:
        res.release()


def _gate_and_publish(
    docs: DataFrame,
    root: str,
    rules: list[dict] | None,
    note: str,
    profile_rows: list[dict] | None = None,
) -> int:
    """The shared gate→publish tail of both release entry points: profile
    once, enforce absolute + drift rules against the previous manifest's
    profile, embed this profile in the new manifest. One definition so
    the two release paths cannot silently diverge on gate protocol.
    ``profile_rows`` supplies a precomputed profile (e.g. the mergeable
    incremental stats of operators/incstats.py) and skips the scan —
    baselines must then stay in the same estimator family across
    releases (see that module's estimator note)."""
    prof_rows = profile_rows if profile_rows is not None else [
        r.asDict() for r in profile_table(docs, ["doc_id", "text"]).collect()
    ]
    enforce_expectations(
        prof_rows,
        rules if rules is not None else DEFAULT_RULES,
        previous=version_profile(root),
    )
    return write_version(docs, root, note=note, profile=prof_rows)


def publish_stream_snapshot(
    spark,
    survivors_dir: str,
    root: str,
    *,
    doc_id: str = "doc_id",
    text_col: str = "text",
    rules: list[dict] | None = None,
    note: str = "",
    profile_rows: list[dict] | None = None,
) -> int:
    """Snapshot a STREAMING near-dup survivor corpus
    (streaming/neardup.py) as an immutable training version — the
    maintenance job that turns the continuously-growing survivors table
    into pinnable releases.

    The stream already deduplicated; this run is gate → publish only:
    profile the survivors (one scan), enforce the same absolute +
    drift rules ``publish_curated_version`` uses (drift vs the previous
    snapshot's manifest-stored profile — a stream that silently stopped
    ingesting, or started nulling text, fails here and publishes
    nothing), then write the version. Trainers pin the version while the
    stream keeps appending; the next snapshot picks up the delta.

    Safe to run while the stream is live for the usual snapshot-isolation
    reason at the FILE level: the survivors table is append-only between
    publishes (batch-keyed dynamic overwrite only rewrites a partition
    during that batch's replay), so a concurrent read sees a consistent
    prefix of batches — EXCEPT while a rows-compaction swaps the table
    (every ``compact_summary_every`` batches the ingest folds committed
    partitions into the base via a staging rename; a reader racing the
    rename can fail its listing and should retry). For byte-precise cut
    points — and to avoid the race entirely — trigger it from the
    stream's own foreachBatch between batches.

    ``profile_rows``: pass the stream's MERGED incremental statistics
    (operators/incstats.py — per-batch sketch parts folded in O(batches))
    to gate without the full profile scan; with it, this job's corpus
    passes drop to write_version's single write + count. The
    estimator-family caveat applies: incremental baselines compare
    against incremental baselines.
    """
    from ..streaming.neardup import read_survivors

    docs = read_survivors(spark, survivors_dir)
    if doc_id != "doc_id" or text_col != "text":
        from pyspark.sql import functions as F

        # passthrough excludes the TARGET names too: a survivors frame
        # that already carries a literal 'doc_id'/'text' beside the
        # custom-named columns would otherwise emit duplicates and kill
        # profile_table with an ambiguous-reference error
        docs = docs.select(
            F.col(doc_id).alias("doc_id"), F.col(text_col).alias("text"),
            *[
                c
                for c in docs.columns
                if c not in (doc_id, text_col, "doc_id", "text")
            ],
        )
    if profile_rows is not None:
        return _gate_and_publish(docs, root, rules, note, profile_rows)
    # the gate's profile collect and write_version's parquet write are
    # two full passes over an uncached source — persist across them
    docs = docs.persist()
    try:
        return _gate_and_publish(docs, root, rules, note)
    finally:
        docs.unpersist()
