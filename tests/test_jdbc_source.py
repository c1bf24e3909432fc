"""JDBC snapshot source tests (sources/jdbc.py).

sqlite3 is the stand-in DBAPI driver, as in test_jdbc_sink.py: the full
path — partition predicates → executor-side connections → schema'd rows →
staleness join — runs against a real SQL engine without a server.
"""

from __future__ import annotations

import sqlite3

import pytest
from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.sources.jdbc import (
    jdbc_snapshot,
    stride_predicates,
)
from vmware_sd_wan_velocloud_bi_intake_spark.streaming.incremental import (
    staleness_filter,
)

SCHEMA = "id long, name string, last_updated string"


def _seed(db_path: str, n: int = 20) -> None:
    with sqlite3.connect(db_path) as conn:
        conn.execute(
            "CREATE TABLE state (id INTEGER PRIMARY KEY, name TEXT, last_updated TEXT)"
        )
        conn.executemany(
            "INSERT INTO state VALUES (?, ?, ?)",
            [
                (
                    i,
                    f"edge-{i}",
                    # even ids fresh, odd ids stale (far past the 8-day gate)
                    "2024-01-30 00:00:00" if i % 2 == 0 else "2023-01-01 00:00:00",
                )
                for i in range(n)
            ],
        )


def test_stride_predicates_cover_all_rows_without_overlap():
    preds = stride_predicates("id", 0, 100, 4)
    assert preds[0] == '"id" < 25'
    assert preds[-1] == '"id" >= 75'
    # every value has exactly one home, including out-of-bounds values
    for v in [-5, 0, 24, 25, 60, 99, 100, 140]:
        hits = sum(
            1
            for p in preds
            if eval(p.replace('"id"', str(v)).replace("AND", "and"))
        )
        assert hits == 1, (v, preds)


def test_snapshot_reads_all_rows_partitioned(spark, tmp_path):
    db = str(tmp_path / "state.db")
    _seed(db)
    df = jdbc_snapshot(
        spark,
        "state",
        SCHEMA,
        connection_factory=lambda: sqlite3.connect(db),
        partition_column="id",
        lower_bound=0,
        upper_bound=20,
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    rows = {r["id"]: r["name"] for r in df.collect()}
    assert rows == {i: f"edge-{i}" for i in range(20)}


def test_snapshot_pushes_where_predicate(spark, tmp_path):
    db = str(tmp_path / "state.db")
    _seed(db)
    df = jdbc_snapshot(
        spark,
        "state",
        SCHEMA,
        connection_factory=lambda: sqlite3.connect(db),
        predicates=["id % 2 = 0", "id % 2 = 1"],
        where="id < 10",
    )
    assert sorted(r["id"] for r in df.collect()) == list(range(10))


def test_snapshot_feeds_staleness_gate(spark, tmp_path):
    """The reference's MySQL staleness probe (fun_mysql_query.py:40-60) as a
    JDBC snapshot joined through staleness_filter: stale/missing ids pass,
    fresh ids are gated."""
    db = str(tmp_path / "state.db")
    _seed(db)
    state = jdbc_snapshot(
        spark,
        "state",
        SCHEMA,
        connection_factory=lambda: sqlite3.connect(db),
        partition_column="id",
        lower_bound=0,
        upper_bound=20,
        num_partitions=3,
    ).withColumn("last_updated", F.to_timestamp("last_updated"))
    batch = spark.range(0, 25).select(F.col("id"))  # 20-24 have no state row
    due = staleness_filter(
        batch,
        state,
        "id",
        asof=F.to_timestamp(F.lit("2024-02-01 00:00:00")),
        max_age_days=8,
        cadence_days=None,
    )
    got = sorted(r["id"] for r in due.collect())
    stale_odd = [i for i in range(20) if i % 2 == 1]
    missing = list(range(20, 25))
    assert got == sorted(stale_odd + missing)


def test_snapshot_production_path_requires_url(spark):
    with pytest.raises(ValueError, match="url"):
        jdbc_snapshot(spark, "t", "id long")


def test_injected_path_coerces_to_declared_schema(spark, tmp_path):
    """The declared schema COERCES on the injected path (mirror of the
    production select+cast): sqlite's dynamic typing hands back ints for
    REAL columns and floats where a long is declared — createDataFrame's
    verifier would raise, the coercion must cast instead."""
    db = str(tmp_path / "mixed.db")
    with sqlite3.connect(db) as conn:
        conn.execute("CREATE TABLE m (id INTEGER, score REAL, label TEXT)")
        # id row 2 stored as float, score row 1 stored as int, label as int
        conn.executemany(
            "INSERT INTO m VALUES (?, ?, ?)",
            [(1, 5, "a"), (2.0, 7.5, 3)],
        )
    df = jdbc_snapshot(
        spark,
        "m",
        "id long, score double, label string",
        connection_factory=lambda: sqlite3.connect(db),
    )
    rows = {r["id"]: (r["score"], r["label"]) for r in df.collect()}
    assert rows == {1: (5.0, "a"), 2: (7.5, "3")}
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint", "double", "string",
    ]
