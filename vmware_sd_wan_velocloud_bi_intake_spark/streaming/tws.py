"""Streaming exact dedup on Spark 4's ``transformWithStateInPandas`` —
the modern arbitrary-state API (SPARK-49564, added 4.0) as a twin of the
``applyInPandasWithState`` operator in :mod:`.stateful`.

Why a twin exists at all: ``applyInPandasWithState`` is the stable API but
couples three concerns into one callback (state layout, timeout protocol,
output), and its single implicit timeout per key is awkward for anything
richer than one TTL. ``transformWithStateInPandas`` splits them —
named state variables created against a handle, an explicit per-key timer
registry, a separate expired-timer callback — and runs only on the RocksDB
state-store provider, which is also the provider a 100 TB deployment wants
(changelog checkpointing, memory-bounded native state instead of
JVM-heap HDFSBackedStateStore maps). Semantics here are IDENTICAL to
:func:`..streaming.stateful.streaming_exact_dedup` (same fingerprint, same
min-id survivor rule, same monotone event-time TTL), pinned by the parity
test in tests/test_tws_dedup.py; which API a deployment picks is an
operational choice, not a semantic one.

Reference lineage: the dedup semantics trace the same spec as the batch
operator (`operators/dedup.exact_dedup_keys`; reference
``powerbi_main_fun.py`` month-dedup discipline) — this module only changes
the state machinery.

Requirements (both checked at PLAN time by ``require_tws``, because
Spark's own failures are opaque mid-query StreamingQueryExceptions):

- ``spark.sql.streaming.stateStore.providerClass`` must be the RocksDB
  provider before the query starts (bundled with Spark 4, no extra jars);
- the ``protobuf`` package must be importable by the Python workers —
  TWS's state server speaks protobuf between the JVM and the Python
  driver worker (``pyspark/sql/streaming/proto/StateMessage_pb2.py``).
  This container does not ship it, so the integration test
  (tests/test_tws_dedup.py) SKIPS there, the same environment-gate
  discipline as the Pillow-conditional multimodal tests; the processor's
  own logic — fold, timer protocol, watermark clamp — is hermetically
  unit-tested against a fake handle, which covers everything except
  Spark's TWS transport itself.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from .stateful import DEDUP_OUTPUT_SCHEMA, _duration_ms

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


def tws_available() -> bool:
    """True when the TWS Python transport's protobuf dependency is
    importable — the environment gate the integration tests key off."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def require_tws(spark) -> None:
    """Fail fast (at plan time, not mid-query) when the environment can't
    run transformWithState: non-RocksDB state store, or no protobuf for
    the Python state-server transport — both otherwise surface as an
    opaque 'driver worker exited unexpectedly (crashed)' after start."""
    current = spark.conf.get(_PROVIDER_KEY, "")
    if "RocksDB" not in current:
        raise ValueError(
            "transformWithStateInPandas requires the RocksDB state store: "
            f'set spark.conf.set("{_PROVIDER_KEY}", "{ROCKSDB_PROVIDER}") '
            "before starting the query (bundled with Spark 4, no extra jars)"
        )
    if not tws_available():
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package on "
            "driver and workers (pip install protobuf) — Spark's TWS state "
            "server speaks protobuf to the Python driver worker; use "
            "streaming.stateful.streaming_exact_dedup (identical "
            "semantics, applyInPandasWithState) where it is unavailable"
        )


class DedupProcessor(StatefulProcessor):
    """Per-fingerprint exact-dedup state as a TWS processor.

    State: one named ValueState ``agg`` holding (keep_id, dup_count) —
    plus (last_ms, deadline_ms) in the TTL variant, where ``deadline_ms``
    mirrors the registered timer so a moved deadline can DELETE the stale
    timer before registering the new one (TWS keeps every registered
    (key, timestamp) timer until fired or deleted; without the delete, an
    early stale timer would evict state the monotone rule just extended).

    The fold itself is the same min-id / cumulative-count / monotone
    last-arrival logic as ``stateful._dedup_fold`` — kept inline rather
    than shared because the two APIs' state objects have different
    shapes (tuple-state vs named-variable handle) and papering over that
    with an adapter would obscure exactly the API difference this twin
    exists to demonstrate.
    """

    def __init__(self, ttl_ms: int | None = None, tz: str = "UTC"):
        self._ttl_ms = ttl_ms
        self._tz = tz

    def init(self, handle: StatefulProcessorHandle) -> None:
        if self._ttl_ms is None:
            self._agg = handle.getValueState("agg", "keep_id long, dup_count long")
        else:
            self._agg = handle.getValueState(
                "agg",
                "keep_id long, dup_count long, last_ms long, deadline_ms long",
            )
        self._handle = handle

    def handleInputRows(
        self,
        key,
        rows: Iterator["pd.DataFrame"],
        timerValues: TimerValues,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        parts = list(rows)
        batch = pd.concat(parts, ignore_index=True)
        ids = batch["doc_id"].dropna()
        if ids.empty:
            raise ValueError(
                "streaming_exact_dedup_tws: doc_id values are not castable "
                "to long (the keep_id contract); fix the id column upstream"
            )
        batch_min = int(ids.min())
        n = len(batch)
        if self._ttl_ms is None:
            prev = self._agg.get() if self._agg.exists() else None
            if prev is not None:
                keep = min(int(prev[0]), batch_min)
                cnt = int(prev[1]) + n
            else:
                keep, cnt = batch_min, n
            self._agg.update((keep, cnt))
        else:
            # same tz discipline as stateful._dedup_fold: Arrow hands the
            # event times over tz-naive in the session timezone
            ts_max = batch["ts"].max()
            if getattr(ts_max, "tzinfo", None) is None:
                ts_max = pd.Timestamp(ts_max).tz_localize(
                    self._tz, ambiguous=True, nonexistent="shift_forward"
                )
            batch_last = int(ts_max.timestamp() * 1000)
            prev = self._agg.get() if self._agg.exists() else None
            if prev is not None:
                keep = min(int(prev[0]), batch_min)
                cnt = int(prev[1]) + n
                # monotone deadline: a late duplicate never pulls the
                # eviction time backwards
                last_ms = max(int(prev[2]), batch_last)
                old_deadline = int(prev[3])
            else:
                keep, cnt, last_ms, old_deadline = batch_min, n, batch_last, -1
            deadline = last_ms + self._ttl_ms
            wm = timerValues.getCurrentWatermarkInMs()
            if deadline <= wm:
                # semantically already expired — fire at the first
                # opportunity instead of registering a past timer
                deadline = wm + 1
            if deadline != old_deadline:
                if old_deadline >= 0:
                    self._handle.deleteTimer(old_deadline)
                self._handle.registerTimer(deadline)
            self._agg.update((keep, cnt, last_ms, deadline))
        yield pd.DataFrame(
            {"dedup_key": [key[0]], "keep_id": [keep], "dup_count": [cnt]}
        )

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator["pd.DataFrame"]:
        # the deadline-mirror protocol deletes superseded timers, so any
        # timer that actually FIRES is the live one: evict. (Guarded
        # anyway: state may already be gone if eviction raced a rescale.)
        if self._agg.exists():
            self._agg.clear()
        return iter([])

    def close(self) -> None:
        pass


SESSION_OUTPUT_SCHEMA = (
    "session_key string, session_start timestamp, session_end timestamp, "
    "n_events long"
)


class SessionProcessor(StatefulProcessor):
    """Gap-closed sessionization as a TWS processor — the piece of the
    API surface :class:`DedupProcessor` doesn't exercise: EMITTING ROWS
    FROM THE EXPIRED-TIMER CALLBACK. A session closes in one of two
    places: mid-batch, when a later event arrives more than ``gap_ms``
    after the open session's last event (emitted from
    ``handleInputRows``); or at the watermark, when no successor ever
    arrives (emitted from ``handleExpiredTimer`` — the timer IS the
    close). Dedup state only ever evicts on timers; sessions produce
    output there, which is why this twin exists.

    Semantics match ``streaming/jobs.streaming_sessions``
    (``session_window``) and the batch gap rule of ``w07_sessionize``:
    events within a batch are sorted by event time and folded; a gap
    > ``gap_ms`` closes the current session and opens the next. Late
    events that arrive after their session closed start a NEW session —
    the standard watermark trade-off every session operator here
    documents. State per key: one open (start_ms, last_ms, n_events)
    triple plus the deadline mirror for stale-timer deletion — O(keys),
    not O(events).
    """

    def __init__(self, gap_ms: int, tz: str = "UTC"):
        self._gap_ms = gap_ms
        self._tz = tz

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._sess = handle.getValueState(
            "sess", "start_ms long, last_ms long, n_events long, deadline_ms long"
        )
        self._handle = handle

    def _emit(self, key, start_ms: int, end_ms: int, n: int):
        import pandas as pd

        # tz-AWARE UTC, not naive: Arrow renders naive pandas timestamps
        # in the Spark session timezone, so naive epoch-ms emission is
        # only correct when session.timeZone is UTC — tz-aware instants
        # convert correctly under ANY session tz (inputs were already
        # localized at the session tz on the way in, making the round
        # trip tz-consistent end to end)
        return pd.DataFrame(
            {
                "session_key": [key[0]],
                "session_start": [pd.Timestamp(start_ms, unit="ms", tz="UTC")],
                "session_end": [pd.Timestamp(end_ms, unit="ms", tz="UTC")],
                "n_events": [n],
            }
        )

    def handleInputRows(
        self,
        key,
        rows: Iterator["pd.DataFrame"],
        timerValues: TimerValues,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        batch = pd.concat(list(rows), ignore_index=True)
        ts = batch["ts"]
        if getattr(ts.dtype, "tz", None) is None:
            ts = ts.dt.tz_localize(
                self._tz, ambiguous=True, nonexistent="shift_forward"
            )
        times = sorted(int(t.timestamp() * 1000) for t in ts)
        prev = self._sess.get() if self._sess.exists() else None
        old_deadline = int(prev[3]) if prev is not None else -1
        # gap-cluster the batch's events into candidate sessions, merge
        # in the open session as one more interval, and re-cluster — this
        # handles the in-watermark out-of-order cases a linear append
        # fold gets wrong: a late event extends a session BACKWARD
        # (start shrinks), and an event more than a gap EARLIER than the
        # open session forms its own, earlier, immediately-closable
        # session instead of silently merging in
        intervals = []
        for t in times:
            if intervals and t - intervals[-1][1] <= self._gap_ms:
                intervals[-1][1] = max(intervals[-1][1], t)
                intervals[-1][2] += 1
            else:
                intervals.append([t, t, 1])
        if prev is not None:
            intervals.append([int(prev[0]), int(prev[1]), int(prev[2])])
            intervals.sort(key=lambda iv: iv[0])
            merged = [intervals[0]]
            for iv in intervals[1:]:
                if iv[0] - merged[-1][1] <= self._gap_ms:
                    merged[-1][1] = max(merged[-1][1], iv[1])
                    merged[-1][2] += iv[2]
                else:
                    merged.append(iv)
            intervals = merged
        # every session with a successor is closed by that successor's
        # existence (its gap has provably elapsed in event time); the
        # last one stays open awaiting the timer
        for start, last, n in intervals[:-1]:
            yield self._emit(key, start, last, n)
        start, last, n = intervals[-1]
        deadline = last + self._gap_ms
        wm = timerValues.getCurrentWatermarkInMs()
        if deadline <= wm:
            deadline = wm + 1  # semantically closed: fire at first chance
        if deadline != old_deadline:
            if old_deadline >= 0:
                self._handle.deleteTimer(old_deadline)
            self._handle.registerTimer(deadline)
        self._sess.update((start, last, n, deadline))

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator["pd.DataFrame"]:
        # stale timers were deleted on every extension, so a firing timer
        # is the live one: the watermark passed last + gap with no
        # successor — close and emit the open session
        if self._sess.exists():
            start, last, n, _dl = (int(x) for x in self._sess.get())
            self._sess.clear()
            yield self._emit(key, start, last, n)

    def close(self) -> None:
        pass


def streaming_sessions_tws(
    events: DataFrame,
    ts: str = "ts",
    key: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """``transformWithStateInPandas`` twin of
    :func:`..streaming.jobs.streaming_sessions`: one row per CLOSED
    session (key, start, end, n_events), closure either mid-batch (a
    successor past the gap) or at the watermark via the per-key timer.
    Append-mode semantics: sessions emit exactly once, when closed.

    END-BOUND CONVENTION — ``session_end`` is the LAST EVENT's
    timestamp (the ``w07_sessionize`` / ``MAX(ts)`` convention the
    parity test pins), NOT ``session_window``'s exclusive
    ``last + gap`` bound. ``streaming_sessions`` (session_window)
    emits ``end = last + gap``; swapping the two operators shifts
    every session_end by exactly the gap — add ``gap`` to this
    operator's session_end (or subtract it from session_window's) when
    comparing outputs.

    Timestamp discipline: inputs are localized at the session timezone
    (Arrow hands naive session-tz wall times to Python), outputs are
    emitted as tz-aware UTC instants — the round trip is correct under
    any session timezone, not just this engine's pinned-UTC default
    (session.py)."""
    from pyspark.sql import functions as F

    require_tws(events.sparkSession)
    session_tz = events.sparkSession.conf.get("spark.sql.session.timeZone")
    keyed = (
        events.where(F.col(ts).isNotNull())
        .withWatermark(ts, watermark)
        .select(
            F.col(key).cast("string").alias("session_key"),
            F.col(ts).alias("ts"),
        )
    )
    return keyed.groupBy("session_key").transformWithStateInPandas(
        SessionProcessor(gap_ms=_duration_ms(gap), tz=session_tz),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )


def streaming_exact_dedup_tws(
    docs: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    *,
    ts_col: str | None = None,
    watermark: str = "1 hour",
    state_ttl: str = "30 days",
) -> DataFrame:
    """``transformWithStateInPandas`` twin of
    :func:`..streaming.stateful.streaming_exact_dedup` — identical output
    contract: one updated (dedup_key, keep_id, dup_count) row per touched
    key per trigger, latest row per key equal to the batch
    ``exact_dedup_keys`` result on a fully consumed stream.

    Without ``ts_col``: timeMode ``none`` — state lives forever (exact
    semantics, unbounded store). With ``ts_col``: the input is watermarked
    and each fingerprint carries an event-time timer at last arrival +
    ``state_ttl`` (monotone, stale timers deleted); when the watermark
    passes it the state row is evicted in ``handleExpiredTimer`` — the
    same recall trade-off the applyInPandasWithState variant documents.

    Scale: per-key state is 2–4 longs in RocksDB (native memory, spillable
    to disk, changelog-checkpointed) — the provider a 1000-executor
    deployment would run this with; the shuffle is one exchange on the
    content fingerprint, identical to the batch groupBy.
    """
    from pyspark.sql import functions as F

    from ..operators.text import normalize_text

    require_tws(docs.sparkSession)
    cols = [
        F.col(doc_id).cast("long").alias("doc_id"),
        F.md5(normalize_text(F.col(text_col))).alias("dedup_key"),
    ]
    if ts_col is None:
        keyed = docs.select(*cols)
        return keyed.groupBy("dedup_key").transformWithStateInPandas(
            DedupProcessor(),
            outputStructType=DEDUP_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    # NULL event times: same drop-at-source contract as the stateful twin
    keyed = (
        docs.where(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .select(*cols, F.col(ts_col).alias("ts"))
    )
    session_tz = docs.sparkSession.conf.get("spark.sql.session.timeZone")
    return keyed.groupBy("dedup_key").transformWithStateInPandas(
        DedupProcessor(ttl_ms=_duration_ms(state_ttl), tz=session_tz),
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="EventTime",
    )
