#!/usr/bin/env python
"""Interleaved A/B timing harness for catalog queries.

The box this repo benches on shows bursty CPU-steal (±20-40% over
minutes), so single-probe before/after comparisons routinely "measure"
regressions that are host weather (the r9 dedup-family case, SCALE.md).
The discipline every round's perf claim uses is INTERLEAVED runs in one
session — sentinel, then each query, repeated — so every pass carries
its own host-speed reading and a burst hits all arms equally. This tool
is that discipline as a command:

    python tools/ab_check.py txt_bpe txt_quality_clf --runs 5
    python tools/ab_check.py dedup_survivors --sf /root/testdata/sf0.1

Prints one row per pass (sentinel + per-query wall) and a summary with
min / median and the sentinel-normalized ratio (query_median /
sentinel_median) — the statistic that survives host drift. Compare
ratios, not walls, across sessions.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vmware_sd_wan_velocloud_bi_intake_spark.queries import all_queries
from vmware_sd_wan_velocloud_bi_intake_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("queries", nargs="+", help="catalog query names")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    spark = get_spark(app_name="ab_check")
    catalog = all_queries()
    unknown = [q for q in args.queries if q not in catalog]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown} (see queries/catalog.py)")

    def sentinel() -> float:
        t0 = time.perf_counter()
        (
            spark.range(0, 20_000_000, 1, 32)
            .select(F.md5(F.col("id").cast("string")).alias("h"))
            .select(F.max("h").alias("m"), F.count("*").alias("n"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return round(time.perf_counter() - t0, 3)

    def run(name: str) -> float:
        t0 = time.perf_counter()
        catalog[name].fn(spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 3)

    # warm pass (unrecorded): JVM, parquet footers, Python worker pool
    sentinel()
    for q in args.queries:
        run(q)

    sents: list[float] = []
    walls: dict[str, list[float]] = {q: [] for q in args.queries}
    for i in range(args.runs):
        s = sentinel()
        sents.append(s)
        row = [f"sent {s:7.3f}"]
        for q in args.queries:
            w = run(q)
            walls[q].append(w)
            row.append(f"{q} {w:7.3f}")
        print("  ".join(row), flush=True)

    s_med = statistics.median(sents)
    summary = {
        "sf": args.sf,
        "runs": args.runs,
        "sentinel": {"min": min(sents), "median": s_med},
        "queries": {
            q: {
                "min": min(v),
                "median": statistics.median(v),
                "ratio_vs_sentinel": round(statistics.median(v) / s_med, 3),
            }
            for q, v in walls.items()
        },
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
