#!/usr/bin/env python
"""Per-vehicle Spark JOB count + wall profile.

Several catalog vehicles are driver-action-floor-dominated at sf0.1
(SCALE.md pins ~0.2-0.3 s per action on this box): their wall is
(number of sequential Spark jobs) x (per-action floor), not data. This
tool makes that first-class: run each named vehicle through the noop
sink under its own job group and report how many Spark jobs it
launched (eager build-time jobs + the final sink job) next to its wall.

    python tools/action_profile.py txt_bpe txt_quality_clf --sf /root/testdata/sf0.1

Job counts are deterministic for a fixture; walls carry host weather —
compare counts across code versions, walls only via tools/ab_check.py.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    from vmware_sd_wan_velocloud_bi_intake_spark.queries import all_queries
    from vmware_sd_wan_velocloud_bi_intake_spark.session import get_spark

    spark = get_spark(app_name="action_profile")
    sc = spark.sparkContext
    catalog = all_queries()
    unknown = [n for n in args.names if n not in catalog]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # warm like bench.py so run 1 is not JVM/pool spin-up
    catalog["a08_pricing_summary"].fn(spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    print(f"{'query':28s} {'jobs':>5s} {'wall_s':>8s} {'s/job':>7s}")
    for name in args.names:
        for run in range(args.runs):
            group = f"profile_{name}_{run}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            catalog[name].fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            per = wall / jobs if jobs else float("nan")
            print(f"{name:28s} {jobs:5d} {wall:8.3f} {per:7.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
