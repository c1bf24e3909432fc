"""Parquet table loaders for the harness fixture tables.

The driver materializes deterministic TPC-H-ish tables (TESTDATA.md) under
``/root/testdata/sf{0.001,0.01,0.1}``. These loaders are the engine's "bronze"
scan layer: plain ``spark.read.parquet`` so Catalyst gets predicate pushdown,
column pruning, and partition pruning for free (SURVEY.md §4 — the reference
hand-rolls these as API-side ``with:``/``interval:`` parameters; under Spark
they are native scan capabilities).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Parquet scans parallelize at row-group granularity, and the fixture files
# are written as a SINGLE row group each — so everything Catalyst fuses into
# the scan stage (shingling, per-row hashing, array folds) serializes into
# one task. ``spread=True`` inserts one round-robin repartition after the
# scan for exactly those compute-before-first-shuffle operators, and ONLY
# when the file is small; above the threshold it never fires, so a 100 TB
# corpus (thousands of row groups, natural scan parallelism) is never
# reshuffled just to gain parallelism. Queries whose first operation is
# already a shuffle (groupBy/window) must NOT spread — they gain nothing
# and pay an extra sort + exchange (measured 2-8× slowdowns).
SPREAD_MAX_BYTES = 256 * 1024 * 1024


def load_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Read one fixture table. Columnar scan; filters/projections push down.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as epoch-nanos long
    and is normalized here to a microsecond timestamp (exact — fixture
    timestamps carry at most microsecond precision).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which the vectorized reader
        # rejects outright; the legacy conf is runtime-settable, so harden
        # here for sessions not built by session.get_spark (e.g. a driver
        # harness session) instead of relying on builder-time config
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass  # conf locked (e.g. marked static) — builder-time value applies
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if spread:
        try:
            small = os.path.getsize(path) <= SPREAD_MAX_BYTES
        except OSError:
            small = False
        if small:
            df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every fixture table into a dict keyed by table name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all tables and register them as temp views for ``spark.sql``."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
