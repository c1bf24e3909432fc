"""JDBC upsert sink tests (sinks/jdbc.py).

sqlite3 is the stand-in DBAPI driver (qmark paramstyle, ANSI ON CONFLICT),
so the full path — Spark partition iteration → multi-row statements →
commit — runs against a real SQL engine without a server.
"""

from __future__ import annotations

import sqlite3

import pytest
from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.sinks.jdbc import (
    build_upsert_sql,
    jdbc_upsert,
)


def test_build_upsert_sql_mysql():
    sql = build_upsert_sql("Edge", ["id", "name", "state"], ["id"], 2)
    assert sql == (
        "INSERT INTO `Edge` (`id`, `name`, `state`) VALUES (%s, %s, %s), (%s, %s, %s) "
        "ON DUPLICATE KEY UPDATE `name`=VALUES(`name`), `state`=VALUES(`state`)"
    )


def test_build_upsert_sql_ansi_and_keys_only():
    sql = build_upsert_sql("t", ["a", "b"], ["a"], 1, dialect="ansi", placeholder="?")
    assert sql == (
        'INSERT INTO "t" ("a", "b") VALUES (?, ?) '
        'ON CONFLICT ("a") DO UPDATE SET "b"=excluded."b"'
    )
    # degenerate: every column is a key -> no-op update arm
    sql2 = build_upsert_sql("t", ["a"], ["a"], 1, dialect="mysql")
    assert "ON DUPLICATE KEY UPDATE `a`=`a`" in sql2
    with pytest.raises(ValueError):
        build_upsert_sql("t", ["a"], ["a"], 1, dialect="oracle")


def test_build_upsert_sql_quotes_hostile_identifiers():
    # a column name with spaces / reserved words / quote chars must not
    # break out of the identifier position
    sql = build_upsert_sql("my table", ["id", 'evil"col', "select"], ["id"],
                           1, dialect="ansi", placeholder="?")
    assert '"my table"' in sql and '"evil""col"' in sql and '"select"' in sql
    sql_my = build_upsert_sql("t`x", ["id", "k`ey"], ["id"], 1)
    assert "`t``x`" in sql_my and "`k``ey`" in sql_my


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


def test_streaming_foreachbatch_jdbc_upsert(spark, tmp_path):
    """velocloud stream -> foreachBatch -> JDBC upsert: replayed/overlapping
    micro-batches converge to one row per PK."""
    from vmware_sd_wan_velocloud_bi_intake_spark.sinks.jdbc import (
        jdbc_upsert_writer,
    )
    from vmware_sd_wan_velocloud_bi_intake_spark.sources.datasource import (
        VeloCloudDataSource,
    )

    spark.dataSource.register(VeloCloudDataSource)
    db = str(tmp_path / "stream.db")
    with sqlite3.connect(db) as conn:
        conn.execute(
            "CREATE TABLE ev (vco TEXT, enterprise_id INTEGER, event_ts TEXT,"
            " event TEXT, edgeLogicalId TEXT,"
            " PRIMARY KEY (vco, enterprise_id, event_ts, event))"
        )
    start_ms = 1704067200000
    stream = (
        spark.readStream.format("velocloud")
        .option("entity", "events")
        .option("fleet", "vco0")
        .option("n_enterprises", "2")
        .option("start_ms", str(start_ms))
        .option("end_ms", str(start_ms + 6 * 24 * 3600 * 1000))
        .option("advance_ms", str(2 * 24 * 3600 * 1000))
        .load()
        .withColumn("event_ts", F.col("event_ts").cast("string"))
    )
    q = (
        stream.writeStream.foreachBatch(
            jdbc_upsert_writer(
                "ev",
                ["vco", "enterprise_id", "event_ts", "event"],
                lambda: _connect(db),
                dialect="ansi",
                placeholder="?",
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    batch_rows = (
        spark.read.format("velocloud")
        .option("entity", "events")
        .option("fleet", "vco0")
        .option("n_enterprises", "2")
        .load()
        .filter(
            (F.col("event_ts") >= F.timestamp_millis(F.lit(start_ms)))
            & (
                F.col("event_ts")
                < F.timestamp_millis(F.lit(start_ms + 6 * 24 * 3600 * 1000))
            )
        )
        .select("vco", "enterprise_id", F.col("event_ts").cast("string"), "event")
        .distinct()
        .count()
    )
    with sqlite3.connect(db) as conn:
        n = conn.execute("SELECT COUNT(*) FROM ev").fetchone()[0]
    assert n == batch_rows > 0
