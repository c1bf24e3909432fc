"""Physical-plan regression tests: the scale properties we designed for must
be visible in the plans Catalyst actually produces — predicate pushdown into
the parquet scan, broadcast joins for dim/anti joins, no cartesian products
anywhere in the catalog, and map-side partial aggregation."""

from __future__ import annotations

import pytest

from vmware_sd_wan_velocloud_bi_intake_spark.queries import all_queries

CATALOG = all_queries()


def _plan(spark, sf, name: str) -> str:
    df = CATALOG[name].fn(spark, sf)
    qe = df._jdf.queryExecution()
    return qe.explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filters_push_into_scan(spark, sf_smoke):
    plan = _plan(spark, sf_smoke, "p03_event_gates")
    assert "PushedFilters: [" in plan
    # the state gate and skip-list must reach the scan, not sit in a Filter
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "Not(EqualTo(event_type,click))" in pushed
    assert "Not(EqualTo(event_type,view))" in pushed
    assert "IsNotNull(user_id)" in pushed


def test_scan_prunes_columns(spark, sf_smoke):
    plan = _plan(spark, sf_smoke, "a08_pricing_summary")
    # lineitem has 16 columns; the pricing summary needs 7
    read = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert read.count(",") <= 7, read
    assert "l_comment" not in read


@pytest.mark.parametrize(
    "name", ["j01_metrics_join", "j04_region_rollup", "w05_backfill_missing", "j02_semi_anti"]
)
def test_dim_and_state_joins_broadcast(spark, sf_smoke, name):
    plan = _plan(spark, sf_smoke, name)
    assert "BroadcastHashJoin" in plan, name
    assert "SortMergeJoin" not in plan, name


def test_semi_and_anti_joins_both_physical(spark, sf_smoke):
    # the merged vehicle must still plan BOTH join operators — the union
    # must not have collapsed them into EXISTS-flag aggregation
    plan = _plan(spark, sf_smoke, "j02_semi_anti")
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan


# Bounded nested-loop joins that are the designed shape, not an accident:
# - p07_edge_attributes: the folded a15 census — every row × ONE broadcast
#   census row (cross of two single-row global aggregates)
# - sim_ann_ivf: every vector × an 8-row broadcast centroid table (IVF
#   coarse assignment — k-row broadcast fan-out, never n×n)
# - a19_grouping_rollup: the grand-total tier stitches three SINGLE-ROW
#   global aggregates (two-pass rollup — the price of dropping the 9x
#   rollup×distinct expand)
# - txt_bpe: merge table (num_merges rows) × the single-row encode totals
_SCALAR_CROSS_OK = {
    "p07_edge_attributes",
    "sim_ann_ivf",
    "a19_grouping_rollup",
    # same deliberate broadcast n x n_cells assignment as sim_ann_ivf
    "dedup_semantic",
    "txt_bpe",
    # r11 fold: the q17 rider is a SINGLE-ROW global aggregate broadcast
    # onto every q18 row (constant columns) — k×1, never n×n
    "q18_large_orders",
}


def test_no_cartesian_products_anywhere(spark, sf_smoke):
    for name in sorted(CATALOG):
        plan = _plan(spark, sf_smoke, name)
        assert "CartesianProduct" not in plan, name
        if name not in _SCALAR_CROSS_OK:
            assert "BroadcastNestedLoopJoin" not in plan, name


def test_q21_decorrelates_to_keyed_semi_anti(spark, sf_smoke):
    """The Q21-shape correlated EXISTS / NOT EXISTS must plan as SEMI and
    ANTI hash joins KEYED on the order key (the l_suppkey <> residual
    rides the equi join as an extra condition) — never a nested-loop scan
    of lineitem per row. At bench sf the small side broadcasts; at scale
    Catalyst's size stats flip the same logical joins to co-partitioned
    SMJ on l_orderkey, which is why the equi key must be in the plan."""
    plan = _plan(spark, sf_smoke, "q21_waiting_suppliers")
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # the equi key reached both join operators (keys line mentions
    # l_orderkey on semi/anti join rows of the formatted plan)
    assert plan.count("l_orderkey") >= 2, plan


def test_qoe_suite_is_one_scan_no_joins(spark, sf_smoke):
    # w02 derives outage + lag + run-length columns from ONE islands pass;
    # the three-operator join form scanned events three times
    plan = _plan(spark, sf_smoke, "w02_outage_summary")
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "Join" not in plan


def test_customer_rollup_single_orders_aggregate(spark, sf_smoke):
    # counts + flags fold into one groupBy: exactly one aggregate exchange
    # on o_custkey (plus the customer-side join), not two joined aggregates
    plan = _plan(spark, sf_smoke, "a06_customer_rollup")
    import re

    aggs = len(re.findall(r"\) HashAggregate$", plan, re.M))
    # partial + final for the single orders groupBy = 2 HashAggregate nodes
    assert aggs <= 2, plan


def test_rollup_aggregates_partially(spark, sf_smoke):
    # one groupBy pass replaces the reference's 8 EXISTS probes (J5/A6);
    # partial_ aggregation must appear below the exchange (map-side combine)
    plan = _plan(spark, sf_smoke, "a06_customer_rollup")
    assert "partial_" in plan
    assert plan.index("partial_") < plan.index("Exchange") or "Exchange" in plan


def test_signature_queries_are_narrow(spark, sf_smoke):
    # minhash/simhash signatures are pure map work fused into the scan —
    # a shuffle here would move every shingle of every doc for nothing
    plan = _plan(spark, sf_smoke, "dedup_signatures")
    # only the opt-in round-robin spread may appear — never a wide dep
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("Location: InMemoryFileIndex") == 1  # one corpus scan


def test_neardup_single_corpus_scan_single_wide_shuffle(spark, sf_smoke):
    from vmware_sd_wan_velocloud_bi_intake_spark.operators.dedup import (
        near_dup_pairs,
    )
    from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    df = near_dup_pairs(
        docs, "doc_id", "text", threshold=0.4, num_hashes=4, bands=2, shingle_n=3
    )
    qe = df._jdf.queryExecution()
    plan = qe.explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # one scan of documents (payload-carrying form; the join-back form read
    # it 3x); formatted explain prints one Location line per distinct scan
    assert plan.count("Location: InMemoryFileIndex") == 1
    # no join back to the corpus at all
    assert "Join" not in plan
    # wide deps: bucket groupBy + final pair distinct only
    assert plan.count("Exchange hashpartitioning") <= 2


@pytest.mark.parametrize(
    "name",
    ["q03_shipping_priority", "q05_local_supplier_volume", "q10_returned_items"],
)
def test_multiway_joins_broadcast_dims_no_bnlj(spark, sf_smoke, name):
    plan = _plan(spark, sf_smoke, name)
    assert "BroadcastNestedLoopJoin" not in plan, name
    assert "CartesianProduct" not in plan, name
    # dim sides broadcast at this SF; big-fact joins may legitimately become
    # SortMergeJoin at scale, but something must broadcast here
    assert "BroadcastHashJoin" in plan, name


def test_a19_and_a22_have_no_expand(spark, sf_smoke):
    """The multi-distinct restructures must hold in the physical plan: no
    Expand node anywhere — distinct counts come from narrow projected
    dedups (a19 two-pass rollup) or their own plain countDistinct-free
    branches, never from expand-replicated rows riding a percentile or
    rollup aggregate. (a22's cd branch IS a multi-distinct expand, but a
    cheap standalone one — allow Expand only there.)"""
    plan19 = _plan(spark, sf_smoke, "a19_grouping_rollup")
    assert "Expand" not in plan19, plan19
    # a22: the expand, if planned, must not coexist with a sort aggregate
    # over percentile buffers in the same exchange chain — weaker check:
    # the sketch branch's ObjectHashAggregate must exist independently
    plan22 = _plan(spark, sf_smoke, "a22_sketch_stats")
    assert "ObjectHashAggregate" in plan22
    # round 6: the exact-percentile anchor (O(group) value buffer) is gone —
    # every percentile in the plan is the fixed-memory sketch form, and the
    # rank-verification branch joins the 3-row estimates by broadcast
    assert plan22.count("percentile(") == plan22.count("approx_percentile(")
