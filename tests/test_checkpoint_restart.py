"""Checkpoint stop/restart end-to-end: streaming_sessions → JDBC upsert.

The deployment contract the reference's scheduled batch never had: a
streaming job stopped mid-corpus and restarted from its checkpoint must
(a) not re-read data the offset log already committed, (b) carry OPEN
session state and the watermark across the restart (sessions opened
before the stop close and emit after it), and (c) converge the sink to
exactly the batch-twin result for every watermark-closed session —
exactly-once EFFECT via source offset tracking + PK-idempotent upserts.
"""

from __future__ import annotations

import datetime
import sqlite3

import pytest
from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.sinks.jdbc import jdbc_upsert
from vmware_sd_wan_velocloud_bi_intake_spark.streaming.jobs import (
    streaming_sessions,
)

SCHEMA = "user_id long, ts timestamp"


def _t(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


# batch 1: user 1 one 3-event session, user 2 one 2-event session. With a
# 1 h watermark delay the watermark ends batch 1 at 09:20 — NOTHING closes;
# both sessions are open state that must survive the stop/restart.
ROWS_1 = [(1, _t(10, 0)), (1, _t(10, 5)), (1, _t(10, 10)),
          (2, _t(10, 0)), (2, _t(10, 20))]
# batch 2 (after the restart): new sessions + watermark → 13:00, which
# closes (and first emits) BOTH batch-1 sessions — proof the restarted
# query holds the pre-stop state, not just the pre-stop offsets.
ROWS_2 = [(1, _t(13, 0)), (1, _t(13, 10)), (2, _t(14, 0))]
# batch 3 (second restart): watermark → 19:00 closes the batch-2 sessions;
# user 3's own session stays open and must never reach the sink.
ROWS_3 = [(3, _t(20, 0))]


def _connect(db_path: str):
    conn = sqlite3.connect(db_path, timeout=30)
    conn.execute("PRAGMA busy_timeout=30000")
    return conn


def _sessions_stream(spark, stream_dir):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        # each batch write is a DIRECTORY of part files: glob into them
        .parquet(str(stream_dir / "*.parquet"))
    )
    out = streaming_sessions(
        stream, ts="ts", key="user_id", gap="30 minutes", watermark="1 hour"
    )
    # timestamps as ISO strings so the sqlite PK comparison is exact
    return out.select(
        "user_id",
        F.col("session_start").cast("string").alias("session_start"),
        F.col("session_end").cast("string").alias("session_end"),
        "n_events",
    )


def _run_once(spark, stream_dir, cp_dir, db):
    q = (
        _sessions_stream(spark, stream_dir)
        .writeStream.outputMode("append")
        .foreachBatch(
            lambda batch_df, bid: jdbc_upsert(
                batch_df,
                "sessions",
                ["user_id", "session_start"],
                lambda: _connect(db),
                dialect="ansi",
                placeholder="?",
            )
        )
        .option("checkpointLocation", str(cp_dir))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)


def _table(db):
    with sqlite3.connect(db) as conn:
        return sorted(map(tuple, conn.execute("SELECT * FROM sessions")))


def _logged_files(cp_dir) -> set[str]:
    """Basenames the file-source offset log has admitted, ever.

    The checkpoint's ``sources/0`` dir holds one JSON-lines log per batch:
    the ground truth of what the source actually read — the exactly-once
    evidence, independent of progress metrics.
    """
    import json

    out = set()
    src = cp_dir / "sources" / "0"
    if not src.exists():
        return out
    for f in src.iterdir():
        if f.name.startswith("."):
            continue
        for line in f.read_text().splitlines():
            if line.startswith("{"):
                path = json.loads(line)["path"]
                # batch dir name (writes are directories of part files)
                out.add(next(p for p in path.split("/") if p.startswith("b00")))
    return out


# slow tier (r14 re-tier, VERDICT r13 #2): restart/exactly-once class kept default by the per-ingest crash-replay batteries (neardup summary-crash replay, annindex build-crash replay)
@pytest.mark.slow
def test_checkpoint_restart_exactly_once(spark, tmp_path):
    stream_dir = tmp_path / "sessions_stream"
    stream_dir.mkdir()
    cp_dir = tmp_path / "cp"
    db = str(tmp_path / "sessions.db")
    with sqlite3.connect(db) as conn:
        conn.execute(
            "CREATE TABLE sessions (user_id INTEGER, session_start TEXT, "
            "session_end TEXT, n_events INTEGER, "
            "PRIMARY KEY (user_id, session_start))"
        )

    spark.createDataFrame(ROWS_1, SCHEMA).coalesce(1).write.parquet(
        str(stream_dir / "b000.parquet")
    )
    _run_once(spark, stream_dir, cp_dir, db)
    assert _logged_files(cp_dir) == {"b000.parquet"}
    # watermark (09:20) hasn't closed anything: open state, empty sink
    assert _table(db) == []

    # ---- restart 1: new data lands while the query is DOWN ----
    spark.createDataFrame(ROWS_2, SCHEMA).coalesce(1).write.parquet(
        str(stream_dir / "b001.parquet")
    )
    _run_once(spark, stream_dir, cp_dir, db)
    # the offset log admitted ONLY the new file — batch 1 is never re-read
    assert _logged_files(cp_dir) == {"b000.parquet", "b001.parquet"}
    # ...yet batch-1's sessions emit NOW (closed by the advanced watermark):
    # the restarted query held the pre-stop session state
    assert {r[0] for r in _table(db)} == {1, 2}
    assert len(_table(db)) == 2

    # ---- restart 2: a straggler closes the batch-2 sessions ----
    spark.createDataFrame(ROWS_3, SCHEMA).coalesce(1).write.parquet(
        str(stream_dir / "b002.parquet")
    )
    _run_once(spark, stream_dir, cp_dir, db)
    assert _logged_files(cp_dir) == {
        "b000.parquet", "b001.parquet", "b002.parquet"
    }

    # sink == batch twin over everything the watermark (19:00) closed;
    # user 3's still-open session must be absent
    all_rows = spark.createDataFrame(ROWS_1 + ROWS_2 + ROWS_3, SCHEMA)
    expected = sorted(
        (r["user_id"], str(r["sw"]["start"]), str(r["sw"]["end"]), r["n_events"])
        for r in all_rows.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("sw"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .collect()
        if r["user_id"] != 3
    )
    assert _table(db) == expected

    # ---- a final restart with no new data is a no-op (idempotent) ----
    logged_before = _logged_files(cp_dir)
    _run_once(spark, stream_dir, cp_dir, db)
    assert _logged_files(cp_dir) == logged_before
    assert _table(db) == expected
