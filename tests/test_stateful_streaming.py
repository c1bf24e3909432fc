"""The applyInPandasWithState outage machine must (a) agree with the batch
gaps-and-islands operator on a fully consumed stream and (b) carry open
runs ACROSS micro-batch boundaries — the property that makes it a genuinely
stateful operator rather than a per-batch aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.operators.sequences import (
    qoe_outage_summary,
)
from vmware_sd_wan_velocloud_bi_intake_spark.streaming.stateful import (
    _fold_outages,
    streaming_outage_summary,
)

# Sequences chosen so outage runs SPAN the batch-1/batch-2 boundary:
# user 1: [4,2,2 | 2,0,0,4,2] → one brownout (island 2,2,2 spanning the
#         split), one blackout (0,0 from 2), one more brownout at the end.
# user 2: [0,4,4 | 2,2,2,2,0] → brownout spanning nothing (starts batch 2),
#         blackout from 2 at the end; leading 0 has no predecessor → not
#         counted (island_prev IS NULL semantics).
SEQS = {1: [4, 2, 2, 2, 0, 0, 4, 2], 2: [0, 4, 4, 2, 2, 2, 2, 0]}
SPLIT = 3  # first 3 samples per user → micro-batch 1, rest → micro-batch 2


def _rows(which: slice):
    import datetime

    out = []
    for uid, seq in SEQS.items():
        for i, s in list(enumerate(seq))[which]:
            ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i)
            out.append((uid, ts, i, s))
    return out


def test_pure_fold_matches_island_model():
    st = (None, False, False, 0, 0, 0, 0, 0)
    st = _fold_outages(st, SEQS[1])
    assert (st[3], st[4], st[5], st[6]) == (2, 4, 1, 2)
    st2 = _fold_outages((None, False, False, 0, 0, 0, 0, 0), SEQS[2])
    assert (st2[3], st2[4], st2[5], st2[6]) == (1, 4, 1, 1)


def test_fold_is_split_invariant():
    # cutting the sequence anywhere must not change the result
    for cut in range(len(SEQS[1]) + 1):
        st = (None, False, False, 0, 0, 0, 0, 0)
        st = _fold_outages(st, SEQS[1][:cut])
        st = _fold_outages(st, SEQS[1][cut:])
        assert (st[3], st[4], st[5], st[6]) == (2, 4, 1, 2), cut


@pytest.mark.parametrize("n_batches", [1, 2])
def test_streaming_state_spans_microbatches(spark, tmp_path, n_batches):
    schema = "user_id long, ts timestamp, event_id long, state int"
    stream_dir = tmp_path / f"qoe_stream_{n_batches}"
    stream_dir.mkdir()
    if n_batches == 1:
        batches = [_rows(slice(None))]
    else:
        batches = [_rows(slice(None, SPLIT)), _rows(slice(SPLIT, None))]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(stream_dir / f"b{i:03d}.parquet")
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stream_dir / "*.parquet"))
    )
    name = f"outage_state_{n_batches}"
    q = (
        streaming_outage_summary(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # latest emission per key = the cumulative summary
    final = (
        spark.sql(f"SELECT * FROM {name}")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("n_seen"))
            ),
        )
        .where("rn = 1")
        .drop("rn")
    )
    batch_df = spark.createDataFrame(_rows(slice(None)), schema)
    expected = qoe_outage_summary(batch_df, "user_id", ["ts", "event_id"]).select(
        "user_id", "brownouts", "brownout_samples", "blackouts", "blackout_samples"
    )
    got = final.select(
        "user_id", "brownouts", "brownout_samples", "blackouts", "blackout_samples"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))


# ---------------------------------------------------------------------------
# Stateful exact dedup: cross-micro-batch AND cross-restart (round 6).
# ---------------------------------------------------------------------------
def test_streaming_exact_dedup_survives_restart(spark, tmp_path):
    """Kill/restart parity for the fingerprint state store: a duplicate
    arriving in a later RUN (not just a later micro-batch) must count
    against the original, and the min-id survivor rule must hold across
    the restart — converging the sink to the batch exact_dedup_keys
    result exactly."""
    import sqlite3

    from vmware_sd_wan_velocloud_bi_intake_spark.operators.dedup import (
        exact_dedup_keys,
    )
    from vmware_sd_wan_velocloud_bi_intake_spark.sinks.jdbc import jdbc_upsert
    from vmware_sd_wan_velocloud_bi_intake_spark.streaming.stateful import (
        streaming_exact_dedup,
    )

    schema = "doc_id long, text string"
    # run 1: one duplicated content (10, 11) and a singleton (12)
    rows_1 = [(10, "alpha  beta"), (11, "Alpha beta"), (12, "gamma delta")]
    # run 2 (after the stop): doc 5 duplicates the run-1 content with a
    # SMALLER id — keep_id must drop to 5 — plus a fresh singleton
    rows_2 = [(5, "alpha BETA"), (13, "epsilon")]

    stream_dir = tmp_path / "docs_stream"
    stream_dir.mkdir()
    cp_dir = tmp_path / "cp_dedup"
    db = str(tmp_path / "dedup.db")
    with sqlite3.connect(db) as conn:
        conn.execute(
            "CREATE TABLE dedup (dedup_key TEXT PRIMARY KEY, "
            "keep_id INTEGER, dup_count INTEGER)"
        )

    def _connect():
        conn = sqlite3.connect(db, timeout=30)
        conn.execute("PRAGMA busy_timeout=30000")
        return conn

    def _run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(stream_dir / "*.parquet"))
        )
        q = (
            streaming_exact_dedup(stream)
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda batch_df, bid: jdbc_upsert(
                    batch_df,
                    "dedup",
                    ["dedup_key"],
                    _connect,
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

    def _table():
        with sqlite3.connect(db) as conn:
            return sorted(map(tuple, conn.execute("SELECT * FROM dedup")))

    spark.createDataFrame(rows_1, schema).coalesce(1).write.parquet(
        str(stream_dir / "b000.parquet")
    )
    _run_once()
    by_key = {r[0]: r for r in _table()}
    assert len(by_key) == 2
    assert (10, 3) not in {(r[1], r[2]) for r in _table()}
    dup_row = [r for r in _table() if r[2] == 2]
    assert dup_row and dup_row[0][1] == 10  # min of (10, 11)

    spark.createDataFrame(rows_2, schema).coalesce(1).write.parquet(
        str(stream_dir / "b001.parquet")
    )
    _run_once()

    # batch twin over EVERYTHING ever streamed (normalization folds case
    # and whitespace, so all three "alpha beta" variants share a key)
    expected = sorted(
        map(
            tuple,
            exact_dedup_keys(
                spark.createDataFrame(rows_1 + rows_2, schema), "doc_id", "text"
            ).collect(),
        )
    )
    assert _table() == expected
    assert [r for r in _table() if r[2] == 3][0][1] == 5  # survivor dropped to 5

    # idempotent no-op restart
    _run_once()
    assert _table() == expected


def test_streaming_exact_dedup_ttl_evicts_state(spark, tmp_path):
    """Event-time TTL bounds the fingerprint store: a fingerprint idle
    past last-arrival + state_ttl is evicted once the watermark passes,
    so a later duplicate re-enters as a fresh original (documented recall
    trade-off) — while a fingerprint refreshed within the TTL keeps
    accumulating across the same horizon."""
    import datetime

    from vmware_sd_wan_velocloud_bi_intake_spark.streaming.stateful import (
        streaming_exact_dedup,
    )

    t0 = datetime.datetime(2024, 1, 1)
    hr = datetime.timedelta(hours=1)
    schema = "doc_id long, ts timestamp, text string"
    # X refreshes every hour (stays inside the 10-minute TTL *relative to
    # the advancing watermark* because each arrival reschedules the
    # timeout); Y is seen once, then not until 3 h later — evicted.
    batches = [
        [(1, t0, "text x"), (2, t0, "text y")],
        [(3, t0 + hr, "text x")],
        [(4, t0 + 2 * hr, "text x")],
        [(9, t0 + 3 * hr, "text y")],
    ]
    stream_dir = tmp_path / "ttl_stream"
    stream_dir.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(stream_dir / f"b{i:03d}.parquet")
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stream_dir / "*.parquet"))
    )
    q = (
        streaming_exact_dedup(
            stream, ts_col="ts", watermark="0 seconds", state_ttl="10 minutes"
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("dedup_ttl")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["dedup_key"], r["keep_id"], r["dup_count"])
        for r in spark.sql("SELECT * FROM dedup_ttl").collect()
    }
    kx = {k for (k, kid, _c) in got if kid in (1, 3, 4)}
    ky = {k for (k, kid, _c) in got if kid in (2, 9)}
    assert len(kx) == 1 and len(ky) == 1 and kx != ky
    (kx,), (ky,) = kx, ky
    # X never evicted: cumulative counts with the min-id survivor
    assert {(kid, c) for (k, kid, c) in got if k == kx} == {(1, 1), (1, 2), (1, 3)}
    # Y evicted between its arrivals: the second sighting RESTARTS as a
    # fresh original (keep_id 9, count 1) instead of accumulating to (2, 2)
    assert {(kid, c) for (k, kid, c) in got if k == ky} == {(2, 1), (9, 1)}


# slow tier (r14 re-tier, VERDICT r13 #2): TTL property replication: test_streaming_exact_dedup_ttl_evicts_state keeps the TTL class default
@pytest.mark.slow
def test_ttl_deadline_monotone_under_late_duplicates(spark, tmp_path):
    """A late (within-watermark) duplicate must never pull the eviction
    deadline BACKWARDS: the timeout derives from the max event time the
    fingerprint has ever seen (carried in state), not the batch max. With
    the r7 pre-fix behavior the 11:30 straggler rescheduled X's timeout
    to 12:10, batch 4's watermark (12:25) silently evicted it, and the
    14:35 duplicate restarted as a fresh original."""
    import datetime

    from vmware_sd_wan_velocloud_bi_intake_spark.streaming.stateful import (
        streaming_exact_dedup,
    )

    t = lambda h, m: datetime.datetime(2024, 1, 1, h, m)
    schema = "doc_id long, ts timestamp, text string"
    batches = [
        [(1, t(12, 0), "text x")],
        [(2, t(11, 30), "text x")],   # late duplicate (wm is 10:00)
        [(7, t(14, 25), "filler z")],  # advances wm to 12:25
        [(8, t(14, 30), "filler w")],  # X has no data: eviction window
        [(3, t(14, 35), "text x")],    # arrives while wm 12:30 < 12:40
    ]
    stream_dir = tmp_path / "ttl_mono"
    stream_dir.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(stream_dir / f"b{i:03d}.parquet")
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stream_dir / "*.parquet"))
    )
    q = (
        streaming_exact_dedup(
            stream, ts_col="ts", watermark="2 hours", state_ttl="40 minutes"
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("dedup_ttl_mono")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["keep_id"], r["dup_count"])
        for r in spark.sql(
            "SELECT * FROM dedup_ttl_mono WHERE keep_id IN (1, 2, 3)"
        ).collect()
    }
    # correct deadline: last sighting 12:00 + 40min = 12:40 — alive at
    # wm 12:25 (batch 4) and wm 12:30 (batch 5) → the final duplicate
    # ACCUMULATES. The backslid deadline (11:30 + 40min = 12:10) would
    # have been evicted in batch 4 and restarted as (3, 1).
    assert (1, 3) in got, got
    assert (3, 1) not in got, got


class _FakeState:
    """Minimal GroupState stand-in for unit-testing _dedup_fold."""

    def __init__(self, wm_ms=-1, existing=None):
        self.hasTimedOut = False
        self._st = existing
        self._wm = wm_ms
        self.deadline = None

    @property
    def exists(self):
        return self._st is not None

    @property
    def get(self):
        return self._st

    def update(self, st):
        self._st = st

    def remove(self):
        self._st = None

    def setTimeoutTimestamp(self, ms):
        self.deadline = ms

    def getCurrentWatermarkMs(self):
        return self._wm


def test_dedup_fold_epoch_is_session_tz_independent():
    """Arrow delivers event times tz-NAIVE rendered in the session tz;
    pandas' .timestamp() reads naive as UTC. For a non-UTC session the
    fold must localize first or every deadline shifts by the UTC offset."""
    import pandas as pd

    from vmware_sd_wan_velocloud_bi_intake_spark.streaming.stateful import (
        _dedup_fold,
    )

    # event time 2024-01-01 12:00 EST == 17:00 UTC
    naive = pd.Timestamp("2024-01-01 12:00:00")
    true_epoch_ms = int(
        naive.tz_localize("America/New_York").timestamp() * 1000
    )
    pdfs = [pd.DataFrame({"doc_id": [7], "ts": [naive]})]
    st = _FakeState()
    list(_dedup_fold(("k",), pdfs, st, ttl_ms=600_000, tz="America/New_York"))
    assert st.deadline == true_epoch_ms + 600_000
    assert st._st[2] == true_epoch_ms
    # UTC session: naive == epoch rendering, .timestamp() was already right
    st2 = _FakeState()
    list(_dedup_fold(("k",), pdfs, st2, ttl_ms=600_000, tz="UTC"))
    assert st2.deadline == int(naive.timestamp() * 1000) + 600_000


def test_dedup_fold_clamps_deadline_to_watermark():
    """last_ms + ttl at or behind the current watermark would make Spark
    throw IllegalArgumentException and kill the query (state_ttl shorter
    than the watermark lateness + a late first arrival). The fold clamps
    to watermark + 1: evict at the first opportunity instead of dying."""
    import pandas as pd

    from vmware_sd_wan_velocloud_bi_intake_spark.streaming.stateful import (
        _dedup_fold,
    )

    ts = pd.Timestamp("2024-01-01 10:30:00")
    ts_ms = int(ts.timestamp() * 1000)
    wm_ms = ts_ms + 3_600_000  # watermark one hour PAST the arrival
    pdfs = [pd.DataFrame({"doc_id": [1], "ts": [ts]})]
    st = _FakeState(wm_ms=wm_ms)
    list(_dedup_fold(("k",), pdfs, st, ttl_ms=600_000, tz="UTC"))
    assert st.deadline == wm_ms + 1  # not ts + 10min (which is <= wm)
    # a deadline comfortably past the watermark is NOT clamped
    st2 = _FakeState(wm_ms=ts_ms - 1)
    list(_dedup_fold(("k",), pdfs, st2, ttl_ms=600_000, tz="UTC"))
    assert st2.deadline == ts_ms + 600_000


# slow tier (r14 re-tier, VERDICT r13 #2): robustness replication of the same TTL machinery; eviction test stays default
@pytest.mark.slow
def test_short_ttl_with_long_watermark_does_not_kill_query(spark, tmp_path):
    """state_ttl shorter than the watermark lateness plus a late-but-
    within-watermark arrival: the pre-fix setTimeoutTimestamp landed at or
    behind the watermark and Spark killed the whole query on one row. The
    clamp must let the stream complete."""
    import datetime

    from vmware_sd_wan_velocloud_bi_intake_spark.streaming.stateful import (
        streaming_exact_dedup,
    )

    t = lambda h, m: datetime.datetime(2024, 1, 1, h, m)
    schema = "doc_id long, ts timestamp, text string"
    batches = [
        [(1, t(12, 0), "filler a")],   # wm advances toward 11:00
        [(2, t(11, 4), "text x")],     # 56 min late, ttl 10 min: pre-fix
                                       # deadline 11:14 can trail wm
        [(3, t(13, 0), "filler b")],
    ]
    stream_dir = tmp_path / "ttl_clamp"
    stream_dir.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(stream_dir / f"b{i:03d}.parquet")
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stream_dir / "*.parquet"))
    )
    q = (
        streaming_exact_dedup(
            stream, ts_col="ts", watermark="1 hour", state_ttl="10 minutes"
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("dedup_ttl_clamp")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()  # pre-fix: StreamingQueryException here
    q.stop()
    got = {
        r["keep_id"] for r in spark.sql("SELECT * FROM dedup_ttl_clamp").collect()
    }
    assert {1, 3} <= got  # the on-time rows definitely made it through
