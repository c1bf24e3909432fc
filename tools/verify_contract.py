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
    spark.stop()
    if bad:
        raise SystemExit(f"MISMATCH: {bad}")
    print("verify-contract OK")


if __name__ == "__main__":
    main()
