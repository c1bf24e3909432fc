"""Replica of the driver's oracle comparison: run a catalog query on Spark
and its SQL oracle on DuckDB over the same parquet, then compare row count,
column names, and order-insensitive values."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for name in TABLE_NAMES:
            path = os.path.join(sf_dir, f"{name}.parquet")
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        # full-precision repr: bit-identical doubles normalize identically
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return list of mismatch descriptions (empty = match)."""
    issues: list[str] = []
    spdf = spark_df.toPandas()
    if sorted(spdf.columns) != sorted(oracle_pdf.columns):
        issues.append(
            f"columns differ: spark={sorted(spdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return issues
    if len(spdf) != len(oracle_pdf):
        issues.append(f"row count differ: spark={len(spdf)} oracle={len(oracle_pdf)}")
    a, b = canonical_rows(spdf), canonical_rows(oracle_pdf)
    if a != b:
        diffs = [
            (x, y) for x, y in zip(a, b) if x != y
        ][:5]
        extra_a = [r for r in a if r not in set(b)][:3]
        extra_b = [r for r in b if r not in set(a)][:3]
        issues.append(
            f"values differ; first zip-diffs={diffs} spark-only={extra_a} oracle-only={extra_b}"
        )
    return issues
