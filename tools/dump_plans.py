#!/usr/bin/env python
"""Dump `.explain("formatted")` for catalog queries to plans/<tag>/.

The optimization rounds commit before/after formatted plans for every
query they touch (`plans/r13/<query>_before.txt` / `..._after.txt`) so a
reader without a Spark install can check plan claims (Exchange counts,
join strategies, PushedFilters, BatchEvalPython nodes) against the text.

Usage:
    python tools/dump_plans.py r13 before                 # all 50
    python tools/dump_plans.py r13 after txt_bpe txt_lm   # named only
    SPARK_GRAFT_PLAN_SF=/root/testdata/sf0.1 ...          # non-default sf

Plans are captured PRE-execution (AQE initial plan) at sf0.001 by
default — deterministic for a fixed fixture set and Spark version, and
the same capture mode as tests/plans_snapshot.json.

Caveat for checkpoint-staged vehicles (sim_ann_ivf, txt_quality_clf,
dedup_survivors, a22 if staged): building the DataFrame executes their
eager staging jobs during capture, and the dumped plan begins at the
staged relation (`Scan ExistingRDD`), not the full logical tree — the
staged subtree's shape is visible in the PRE-staging rounds' dumps and
in the operator source.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit("usage: dump_plans.py <tag e.g. r13> <before|after> [names...]")
    tag, phase, names = sys.argv[1], sys.argv[2], sys.argv[3:]

    from vmware_sd_wan_velocloud_bi_intake_spark.queries import all_queries
    from vmware_sd_wan_velocloud_bi_intake_spark.session import get_spark

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name=f"dump_plans_{tag}_{phase}")
    catalog = all_queries()
    targets = names or sorted(catalog)
    unknown = [n for n in targets if n not in catalog]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    fmt = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in targets:
        df = catalog[name].fn(spark, SF_DIR)
        text = df._jdf.queryExecution().explainString(fmt)
        path = os.path.join(out_dir, f"{name}_{phase}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"{path}: {len(text)} bytes")
    spark.stop()


if __name__ == "__main__":
    main()
