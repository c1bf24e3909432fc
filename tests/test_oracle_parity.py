"""The correctness gate, locally: every oracle-checkable catalog query must
match its DuckDB oracle exactly (row count + columns + values) at sf=0.01 —
the same comparison the driver performs."""

from __future__ import annotations

import pytest

from vmware_sd_wan_velocloud_bi_intake_spark.queries import all_queries

from .oracle_util import compare, run_oracle

CATALOG = all_queries()
ORACLE_CHECKED = sorted(n for n, q in CATALOG.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in CATALOG.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_parity(spark, sf_correct, name):
    q = CATALOG[name]
    spark_df = q.fn(spark, sf_correct)
    oracle_pdf = run_oracle(q.oracle, sf_correct)
    # A 0-row match passes all three driver checks without verifying any
    # logic (the round-2 j11 lesson) — every catalog oracle must produce rows.
    assert oracle_pdf.shape[0] > 0, f"{name}: vacuous oracle (0 rows)"
    issues = compare(spark_df, oracle_pdf)
    assert not issues, f"{name}: " + " | ".join(issues)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_smoke, name):
    q = CATALOG[name]
    df = q.fn(spark, sf_smoke)
    assert df.count() >= 0
    assert len(df.columns) > 0
