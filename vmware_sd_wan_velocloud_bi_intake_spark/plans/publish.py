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
        prof_rows = [
            r.asDict() for r in profile_table(res.curated, ["doc_id", "text"]).collect()
        ]
        enforce_expectations(
            prof_rows,
            rules if rules is not None else DEFAULT_RULES,
            previous=version_profile(root),
        )
        return write_version(res.curated, root, note=note, profile=prof_rows)
    finally:
        res.release()
