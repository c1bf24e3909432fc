#!/usr/bin/env python
"""Drive the round driver's contract end-to-end, from OUTSIDE the repo
dir (catches sys.path bugs): import __spark_entry__ by file path, run
entry(spark), validate queries()/oracle_sql() key parity, and
hash-compare a sample of queries against DuckDB at sf0.01 exactly the
way the driver does (sorted columns, stringified cells, NULL-folded
NaNs).

Usage:
    cd /tmp && python /root/repo/tools/verify_contract.py [q1 q2 ...]

With no names, a default sample of recently-risky vehicles is checked;
pass --all for the full 50 (≈ the oracle-parity suite, minutes).

--plans additionally diffs every catalog query's structural plan
features against tests/plans_snapshot.json (VERDICT r11 #7: a plan
regression — new Exchange, broadcast→SMJ flip, a Python UDF — should
surface in the same verify run as a hash regression, not 37 minutes
later in the full suite). ~50 s at sf0.001.
"""

from __future__ import annotations

import importlib.util
import math
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DEFAULT = [
    "dedup_stream_snapshot",
    "q21_waiting_suppliers",
    "q18_large_orders",
    "inc_stats_merge",
    "a08_pricing_summary",
]


def _canon(pdf):
    cols = sorted(pdf.columns)

    def n(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NULL" if math.isnan(v) else repr(v)
        return str(v)

    return sorted(
        tuple(n(x) for x in r)
        for r in pdf[cols].itertuples(index=False, name=None)
    )


def main() -> None:
    import duckdb

    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(_REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from vmware_sd_wan_velocloud_bi_intake_spark.session import get_spark
    from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import (
        TABLE_NAMES,
    )

    spark = get_spark(app_name="verify-contract")
    n_entry = len(mod.entry(spark).collect())
    qs, osql = mod.queries(), mod.oracle_sql()
    assert set(osql) <= set(qs), sorted(set(osql) - set(qs))
    print(f"entry rows: {n_entry}; queries: {len(qs)}; oracles: {len(osql)}")

    if "--all" in sys.argv:
        names = sorted(osql)
    elif not names:
        names = [n for n in _DEFAULT if n in osql]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR_CORRECT", "/root/testdata/sf0.01")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{os.path.join(sf, t + '.parquet')}')"
        )
    bad = []
    for name in names:
        sp = qs[name](spark, sf).toPandas()
        od = con.execute(osql[name]).fetchdf()
        ok = (
            sorted(sp.columns) == sorted(od.columns)
            and len(sp) == len(od)
            and len(od) > 0
            and _canon(sp) == _canon(od)
        )
        print(f"{name}: rows={len(sp)} match={ok}")
        if not ok:
            bad.append(name)

    if "--plans" in sys.argv:
        sys.path.insert(0, _REPO)
        import json

        from tools.gen_plan_snapshot import SNAPSHOT_PATH, plan_features
        from vmware_sd_wan_velocloud_bi_intake_spark.queries import (
            all_queries,
        )

        with open(SNAPSHOT_PATH) as f:
            want = json.load(f)
        cat = all_queries()
        plan_diffs = 0
        if sorted(want) != sorted(cat):
            print("plans: snapshot STALE (catalog changed) — regenerate")
            bad.append("plan-snapshot-stale")
        else:
            for qname, q in sorted(cat.items()):
                got = plan_features(spark, q.fn)
                if got != want[qname]:
                    d = {
                        k: (want[qname].get(k), got.get(k))
                        for k in set(want[qname]) | set(got)
                        if want[qname].get(k) != got.get(k)
                    }
                    print(f"plans: {qname} DRIFTED (want, got): {d}")
                    bad.append(f"plan:{qname}")
                    plan_diffs += 1
            print(f"plans: {len(cat)} checked, {plan_diffs} drifted")

    spark.stop()
    if bad:
        raise SystemExit(f"MISMATCH: {bad}")
    print("verify-contract OK")


if __name__ == "__main__":
    main()
