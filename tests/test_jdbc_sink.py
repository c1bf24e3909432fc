"""JDBC upsert sink tests (sinks/jdbc.py).

sqlite3 is the stand-in DBAPI driver (qmark paramstyle, ANSI ON CONFLICT),
so the full path — Spark partition iteration → multi-row statements →
commit — runs against a real SQL engine without a server.
"""

from __future__ import annotations

import sqlite3

import pytest

from vmware_sd_wan_velocloud_bi_intake_spark.sinks.jdbc import (
    build_upsert_sql,
    jdbc_upsert,
)


def test_build_upsert_sql_mysql():
    sql = build_upsert_sql("Edge", ["id", "name", "state"], ["id"], 2)
    assert sql == (
        "INSERT INTO Edge (id, name, state) VALUES (%s, %s, %s), (%s, %s, %s) "
        "ON DUPLICATE KEY UPDATE name=VALUES(name), state=VALUES(state)"
    )


def test_build_upsert_sql_ansi_and_keys_only():
    sql = build_upsert_sql("t", ["a", "b"], ["a"], 1, dialect="ansi", placeholder="?")
    assert sql == (
        "INSERT INTO t (a, b) VALUES (?, ?) ON CONFLICT (a) DO UPDATE SET b=excluded.b"
    )
    # degenerate: every column is a key -> no-op update arm
    sql2 = build_upsert_sql("t", ["a"], ["a"], 1, dialect="mysql")
    assert "ON DUPLICATE KEY UPDATE a=a" in sql2
    with pytest.raises(ValueError):
        build_upsert_sql("t", ["a"], ["a"], 1, dialect="oracle")


def _connect(db_path: str):
    conn = sqlite3.connect(db_path, timeout=30)
    conn.execute("PRAGMA busy_timeout=30000")
    return conn


def test_jdbc_upsert_end_to_end(spark, tmp_path):
    db = str(tmp_path / "sink.db")
    with sqlite3.connect(db) as conn:
        conn.execute("CREATE TABLE edge (id INTEGER PRIMARY KEY, name TEXT, score INTEGER)")

    df1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, name string, score long"
    ).repartition(2)
    jdbc_upsert(
        df1, "edge", ["id"],
        lambda: _connect(db),
        batch_size=2, dialect="ansi", placeholder="?",
    )
    # second batch: update 2, insert 4; include an intra-batch dup for id=4 —
    # the deterministic survivor (greatest non-key tuple) must win
    df2 = spark.createDataFrame(
        [(2, "b2", 21), (4, "d", 40), (4, "a-low", 4)],
        "id long, name string, score long",
    ).repartition(2)
    jdbc_upsert(
        df2, "edge", ["id"],
        lambda: _connect(db),
        batch_size=2, dialect="ansi", placeholder="?",
    )

    with sqlite3.connect(db) as conn:
        rows = sorted(conn.execute("SELECT id, name, score FROM edge").fetchall())
    assert rows == [(1, "a", 10), (2, "b2", 21), (3, "c", 30), (4, "d", 40)]


def test_jdbc_upsert_is_idempotent_on_replay(spark, tmp_path):
    db = str(tmp_path / "replay.db")
    with sqlite3.connect(db) as conn:
        conn.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, v TEXT)")
    df = spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string")
    for _ in range(2):  # at-least-once delivery replays the same batch
        jdbc_upsert(df, "t", ["k"], lambda: _connect(db),
                    dialect="ansi", placeholder="?")
    with sqlite3.connect(db) as conn:
        rows = sorted(conn.execute("SELECT k, v FROM t").fetchall())
    assert rows == [(1, "x"), (2, "y")]
