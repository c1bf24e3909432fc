"""Query-catalog plumbing.

Each catalog entry binds a Spark implementation to (optionally) an ANSI-SQL
oracle that DuckDB executes over the same parquet tables. The driver compares
row-count + schema + order-insensitive value-hash (see __spark_entry__.py), so
every computed column is aliased identically on both sides and all float
outputs are produced by deterministic arithmetic (decimal-exact aggregation,
fixed-order scalar expressions).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Q:
    """One catalog query.

    fn     : (spark, sf_dir) -> DataFrame
    oracle : equivalent DuckDB SQL, or None for non-SQL-expressible operators
             (driver then records a weaker rows-only check)
    ops    : SURVEY.md §2 operator IDs this query exercises
    doc    : one-line description
    """

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    ops: tuple[str, ...] = field(default=())
    doc: str = ""
