"""Aggregated query catalog — the engine's declared operator coverage.

``__spark_entry__.py`` exposes this to the driver: every entry with an oracle
is hash-compared against DuckDB at sf=0.01; oracle-less entries get rows-only
checks (documented per entry as to why SQL can't express them).
"""

from __future__ import annotations

from . import beyond, events, nested, relational, scalars, textvec, tpch
from .base import Q


def all_queries() -> dict[str, Q]:
    merged: dict[str, Q] = {}
    for mod in (relational, events, textvec, nested, scalars, beyond, tpch):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    return merged
