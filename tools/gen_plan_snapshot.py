#!/usr/bin/env python
"""Snapshot the STRUCTURAL plan features of every catalog query — the
shuffle/join/UDF shape we designed for, as a committed regression net.

For each catalog entry at sf0.001 the formatted physical plan is reduced
to operator counts (exchanges, sort-merge vs broadcast joins,
nested-loop joins, Python UDF evaluations, parquet scans). A future
change that silently adds a shuffle, flips a broadcast join to SMJ, or
drops an expression into a row-at-a-time Python UDF shows up as a
snapshot diff in `tests/test_plan_snapshot.py` instead of as a bench
regression three rounds later.

Counts are taken from the PRE-execution formatted explain (AQE's
initial plan) — deterministic for a fixed fixture set and Spark
version, which is what `tests/test_plans.py` already relies on.

Usage:
    python tools/gen_plan_snapshot.py            # print current features
    python tools/gen_plan_snapshot.py --write    # refresh plans_snapshot.json

Refresh DELIBERATELY (with the diff in the commit) when a plan change is
intentional.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNAPSHOT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "plans_snapshot.json",
)
SF_DIR = "/root/testdata/sf0.001"

# feature -> substring counted in the formatted explain. Node names, not
# generic words, so plan text commentary can't inflate counts.
FEATURES = {
    "exchanges": "Exchange",
    "sort_merge_joins": "SortMergeJoin",
    "broadcast_hash_joins": "BroadcastHashJoin",
    "nested_loop_joins": "BroadcastNestedLoopJoin",
    "cartesian": "CartesianProduct",
    "python_udfs": "BatchEvalPython",  # row-at-a-time (the slow path)
    "arrow_udfs": "ArrowEvalPython",  # vectorized pandas UDFs
    "map_in_pandas": "MapInPandas",  # Arrow-batched mapInPandas kernels
    "grouped_pandas": "FlatMapGroupsInPandas",  # applyInPandas
    "parquet_scans": "Scan parquet",
}


def plan_features(spark, fn) -> dict[str, int]:
    df = fn(spark, SF_DIR)
    qe = df._jdf.queryExecution()
    plan = qe.explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # the formatted explain prints the tree once and then a numbered node
    # legend — count in the tree section only (up to the first blank-line
    # separator) so every operator is counted exactly once
    tree = plan.split("\n\n", 1)[0]
    return {k: tree.count(sub) for k, sub in FEATURES.items()}


def collect() -> dict[str, dict[str, int]]:
    from vmware_sd_wan_velocloud_bi_intake_spark.queries import all_queries
    from vmware_sd_wan_velocloud_bi_intake_spark.session import get_spark

    spark = get_spark(app_name="plan-snapshot")
    out = {
        name: plan_features(spark, q.fn)
        for name, q in sorted(all_queries().items())
    }
    spark.stop()
    return out


def main() -> None:
    snap = collect()
    if "--write" in sys.argv:
        with open(SNAPSHOT_PATH, "w") as f:
            json.dump(snap, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {SNAPSHOT_PATH}")
    else:
        print(json.dumps(snap, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
