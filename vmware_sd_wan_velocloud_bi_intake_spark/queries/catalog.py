"""Aggregated query catalog — the engine's declared operator coverage.

``__spark_entry__.py`` exposes this to the driver: every entry with an oracle
is hash-compared against DuckDB at sf=0.01; oracle-less entries get rows-only
checks (documented per entry as to why SQL can't express them).

ORDER MATTERS: the round driver's correctness gate covers the first 50
entries in insertion order. Round 1 shipped 71 entries, leaving 21 past the
window; round 2 consolidated same-grain vehicles (each fold documented at
its new home) down to exactly 50 — every entry now gets a hash-checked row
every round — and ordered the round-1-unchecked block FIRST so the queries
the driver has never hard-verified lead the window.
"""

from __future__ import annotations

from . import beyond, events, medallion, nested, relational, scalars, textvec, tpch
from .base import Q

# Round-1-unchecked block (VERDICT.md "What's missing" #1), including the
# vehicles that absorbed judge-blessed folds (o02→f09, w06→f28, f22→a17,
# a20→a19, eav_melt+eav_pivot→eav_melt_pivot; r7: f09→f28, a15→p07; r8:
# u01→g01_gateway_rollup, putting the §3.2 gateway DAG under the gate — freeing
# two slots so the round-5/6 flagship operators BPE and the quality
# classifier get their own hash-checked rows, per the r6 verdict's top
# item; r10 per VERDICT r9 "Next round" #1: sim_cosine_neardup→
# sim_cosine_topk (nd_degree column) and dedup_incremental→
# dedup_stream_snapshot (the streamed ingest runs the same incremental
# operator per micro-batch), freeing the slots for the round-9 streaming
# flagship's snapshot vehicle and the incremental-stats vehicle; r11 per
# VERDICT r10 #5: q17_small_quantity→q18_large_orders (q17_* rider
# columns), freeing the slot for q21_waiting_suppliers), then the
# TPC-H shapes and the new medallion entries; the remainder
# (all round-1-green) follows.
ORDER: list[str] = [
    # -- previously outside the driver window -----------------------------
    "eav_melt_pivot",
    "g01_gateway_rollup",
    "f28_json_extract",
    "a17_order_banding",
    "j10_asof_join",
    "a19_grouping_rollup",
    "o05_rank_topn",
    "j11_range_join",
    "j12_full_outer",
    "a21_percentiles",
    "set1_key_populations",
    "a22_sketch_stats",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q10_returned_items",
    "q21_waiting_suppliers",
    "q18_large_orders",
    "med_silver_links",
    "med_gold_rollup",
    # -- round-1-green remainder ------------------------------------------
    "a08_pricing_summary",
    "p07_edge_attributes",
    "a06_customer_rollup",
    "j04_region_rollup",
    "j01_metrics_join",
    "j02_semi_anti",
    "a18_usage_pct",
    "t01_staleness_gate",
    "p08_nested_items",
    "w08_rolling_window",
    "p15_event_pivot",
    "w02_outage_summary",
    "p03_event_gates",
    "w07_sessionize",
    "w04_hourly_min",
    "t04_month_dedup",
    "w05_backfill_missing",
    "a09_score_intended",
    "a11_kth_from_series",
    "f24_overlay_rows",
    "txt_profile",
    "txt_bpe",
    "txt_quality_clf",
    "dedup_semantic",
    "dedup_signatures",
    "dedup_survivors",
    "dedup_stream_snapshot",
    "inc_stats_merge",
    "mm_byte_features",
    "sim_cosine_topk",
    "sim_ann_ivf",
]


def all_queries() -> dict[str, Q]:
    merged: dict[str, Q] = {}
    for mod in (relational, events, textvec, nested, scalars, beyond, tpch, medallion):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    missing = set(ORDER) - merged.keys()
    extra = merged.keys() - set(ORDER)
    if missing or extra:
        raise ValueError(f"catalog/ORDER mismatch: missing={missing} extra={extra}")
    return {name: merged[name] for name in ORDER}
