"""Custom stateful streaming operator: the QoE outage state machine as
``applyInPandasWithState`` (SURVEY.md §2.5 W1–W3, streaming form).

The batch engine computes brownouts/blackouts with a gaps-and-islands pass
(:func:`..operators.sequences.qoe_outage_summary`). In streaming, the same
semantics need *cross-micro-batch* state: a degraded run that starts at the
end of one batch and continues into the next must count as ONE outage with
its full duration. That is exactly what Spark's arbitrary stateful
processing provides — per-key state (last state code, open-run flags,
cumulative counters) kept in the state store across triggers, with the
per-batch work running as an Arrow-batched pandas function.

Reference semantics (derived spec, see operators/sequences.py):
- brownout  := island of RED(2) whose predecessor sample is GREEN(4);
  duration = full island length (CalculateBrownouts,
  powerbi_main_fun.py:1709-1741).
- blackout  := island of BLACK(0) whose predecessor is any non-black state
  (CalculateBlackouts summed over start states 3, 2, 4,
  powerbi_main_fun.py:1855-1879).

Scale: state is O(1) per key (7 scalars); the shuffle is keyed by the
entity id exactly like the batch groupBy. Late/out-of-order data within a
batch is ordered by (ts, event_id) before folding; cross-batch order is the
source's responsibility (file/kafka offsets) — same contract as any
event-log consumer.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

OUTAGE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_state", T.IntegerType()),
        T.StructField("in_brown", T.BooleanType()),
        T.StructField("in_black", T.BooleanType()),
        T.StructField("brownouts", T.LongType()),
        T.StructField("brownout_samples", T.LongType()),
        T.StructField("blackouts", T.LongType()),
        T.StructField("blackout_samples", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)

OUTAGE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("brownouts", T.LongType()),
        T.StructField("brownout_samples", T.LongType()),
        T.StructField("blackouts", T.LongType()),
        T.StructField("blackout_samples", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)

STATE_GREEN = 4
STATE_RED = 2
STATE_BLACK = 0


def _fold_outages(state_tuple, states: list[int]):
    """Pure fold of the outage state machine over one ordered state list."""
    (last, in_brown, in_black, brownouts, brown_s, blackouts, black_s, n) = state_tuple
    for s in states:
        n += 1
        if last is not None and s == last:
            if in_brown and s == STATE_RED:
                brown_s += 1
            if in_black and s == STATE_BLACK:
                black_s += 1
            continue
        in_brown = in_black = False
        if s == STATE_RED and last == STATE_GREEN:
            brownouts += 1
            in_brown = True
            brown_s += 1
        elif s == STATE_BLACK and last is not None and last != STATE_BLACK:
            blackouts += 1
            in_black = True
            black_s += 1
        last = s
    return (last, in_brown, in_black, brownouts, brown_s, blackouts, black_s, n)


def outage_state_func(key, pdfs: Iterator["pd.DataFrame"], state):
    """The ``applyInPandasWithState`` function: fold new samples into the
    per-key machine, emit the cumulative counters once per trigger."""
    import pandas as pd

    if state.exists:
        st = state.get
    else:
        st = (None, False, False, 0, 0, 0, 0, 0)
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
    st = _fold_outages(st, [int(s) for s in rows["state"]])
    state.update(st)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "brownouts": [st[3]],
            "brownout_samples": [st[4]],
            "blackouts": [st[5]],
            "blackout_samples": [st[6]],
            "n_seen": [st[7]],
        }
    )


DEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("keep_id", T.LongType()),
        T.StructField("dup_count", T.LongType()),
    ]
)

# TTL variant carries the fingerprint's LAST event time: the timeout must
# be monotone in it, and a late (within-watermark) duplicate's batch max
# can be EARLIER than what state has seen — rescheduling from the batch
# alone would move the eviction deadline backwards
DEDUP_TTL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("keep_id", T.LongType()),
        T.StructField("dup_count", T.LongType()),
        T.StructField("last_ms", T.LongType()),
    ]
)

DEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("dedup_key", T.StringType()),
        T.StructField("keep_id", T.LongType()),
        T.StructField("dup_count", T.LongType()),
    ]
)


def exact_dedup_state_func(key, pdfs: Iterator["pd.DataFrame"], state):
    """Per-fingerprint dedup state: fold the batch's arrivals into
    (min keep_id, cumulative dup_count) and emit the updated row."""
    yield from _dedup_fold(key, pdfs, state, ttl_ms=None, tz="UTC")


def _dedup_fold(key, pdfs, state, ttl_ms, tz):
    import pandas as pd

    if getattr(state, "hasTimedOut", False):
        # watermark passed last-arrival + TTL: evict. A later duplicate of
        # this fingerprint re-enters as a fresh original — the documented
        # recall trade-off of bounding the store.
        state.remove()
        return
    rows = pd.concat(list(pdfs), ignore_index=True)
    ids = rows["doc_id"].dropna()
    if ids.empty:
        # upstream cast('long') nulled every id in this group — int(NaN)
        # here would kill the whole streaming query with an opaque error
        raise ValueError(
            "streaming_exact_dedup: doc_id values are not castable to "
            "long (the keep_id contract); fix the id column upstream"
        )
    batch_min = int(ids.min())
    n = len(rows)
    if ttl_ms is None:
        if state.exists:
            keep, cnt = state.get
            keep, cnt = min(int(keep), batch_min), int(cnt) + n
        else:
            keep, cnt = batch_min, n
        state.update((keep, cnt))
    else:
        # Arrow hands event times to the worker tz-NAIVE, rendered in
        # spark.sql.session.timeZone; pandas' .timestamp() would read the
        # naive value as UTC and shift every deadline by the session tz's
        # UTC offset. Localize per the session tz first (passed in at
        # plan-build time) so the epoch is timezone-independent.
        ts_max = rows["ts"].max()
        if getattr(ts_max, "tzinfo", None) is None:
            ts_max = pd.Timestamp(ts_max).tz_localize(
                tz, ambiguous=True, nonexistent="shift_forward"
            )
        batch_last = int(ts_max.timestamp() * 1000)
        if state.exists:
            keep, cnt, last_ms = state.get
            keep, cnt = min(int(keep), batch_min), int(cnt) + n
            # monotone deadline: a late duplicate must never pull the
            # eviction time back before (true last sighting) + TTL
            last_ms = max(int(last_ms), batch_last)
        else:
            keep, cnt, last_ms = batch_min, n, batch_last
        state.update((keep, cnt, last_ms))
        # Spark rejects a timeout timestamp at or behind the event-time
        # watermark (IllegalArgumentException kills the whole query). A
        # within-watermark-late first arrival plus a state_ttl shorter
        # than the watermark lateness can land last_ms + ttl there —
        # semantically "already expired", so clamp to watermark + 1:
        # evict at the first opportunity instead of dying.
        deadline = last_ms + ttl_ms
        try:
            wm = int(state.getCurrentWatermarkMs())
        except Exception:
            wm = -1
        if deadline <= wm:
            deadline = wm + 1
        state.setTimeoutTimestamp(deadline)
    yield pd.DataFrame(
        {"dedup_key": [key[0]], "keep_id": [keep], "dup_count": [cnt]}
    )


def make_ttl_dedup_state_func(ttl_ms: int, tz: str = "UTC"):
    """Event-time-TTL variant of :func:`exact_dedup_state_func` — a named
    factory (no loop-variable lambda capture) whose closure holds only the
    immutable TTL scalar and the session timezone (the tz in which Arrow
    renders the tz-naive event times on the worker)."""

    def fn(key, pdfs, state):
        yield from _dedup_fold(key, pdfs, state, ttl_ms=ttl_ms, tz=tz)

    return fn


_DURATION_UNITS_MS = {
    "second": 1_000,
    "minute": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
}


def _duration_ms(spec: str) -> int:
    try:
        n, unit = spec.split()
        return int(n) * _DURATION_UNITS_MS[unit.rstrip("s")]
    except (ValueError, KeyError):
        raise ValueError(
            f"bad duration {spec!r}: expected '<n> seconds|minutes|hours|days'"
        ) from None


def streaming_exact_dedup(
    docs: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    *,
    ts_col: str | None = None,
    watermark: str = "1 hour",
    state_ttl: str = "30 days",
) -> DataFrame:
    """Cross-micro-batch exact dedup over a document stream — the stateful
    completion of ``jobs.streaming_curate_documents``'s per-run
    ``dropDuplicates`` (which keeps first arrivals but can report neither
    duplicate counts nor the batch engine's min-id survivor rule).

    Keyed by the same full-text digest as the batch
    :func:`...operators.dedup.exact_dedup_keys` (md5 of normalized
    content); per-key state is TWO scalars (min doc_id seen, arrivals
    seen) in the state store, maintained across triggers AND across
    stop/restart via the checkpoint — so a duplicate arriving days after
    its original, in a different run, is still counted against it. Each
    trigger emits the updated (dedup_key, keep_id, dup_count) row (output
    mode ``update``); on a fully consumed stream the latest row per key
    equals the batch twin exactly (tested with a kill/restart in
    tests/test_stateful_streaming.py).

    Scale / state bound: without ``ts_col`` the state is O(distinct
    corpus) and never evicts — correct, but at a 100 TB-stream horizon the
    store grows with every distinct document forever. Pass the stream's
    event-time column as ``ts_col`` to bound it: the input is watermarked
    (``watermark`` lateness) and each fingerprint schedules an event-time
    timeout at its last arrival + ``state_ttl`` — once the watermark
    passes that, the state row is evicted (the streaming_event_dedup
    watermark discipline applied to the fingerprint store). Trade-off,
    explicit: a duplicate arriving more than ``state_ttl`` of event time
    after its fingerprint's last sighting re-enters as a fresh original
    (its keep_id restarts, its earlier dup_count is frozen in the sink) —
    the recall loss every TTL'd dedup accepts. For exact-forever
    semantics shard the keyspace upstream instead and keep NoTimeout.
    """
    from ..operators.text import normalize_text
    from pyspark.sql import functions as F

    cols = [
        F.col(doc_id).cast("long").alias("doc_id"),
        F.md5(normalize_text(F.col(text_col))).alias("dedup_key"),
    ]
    if ts_col is None:
        keyed = docs.select(*cols)
        return keyed.groupBy("dedup_key").applyInPandasWithState(
            exact_dedup_state_func,
            outputStructType=DEDUP_OUTPUT_SCHEMA,
            stateStructType=DEDUP_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    # NULL event times carry no TTL information and would NaT-poison the
    # per-key max inside the state function; the watermark machinery
    # ignores them anyway, so drop them at the source (documented: with a
    # ts_col, rows without an event time do not participate in dedup)
    keyed = (
        docs.where(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .select(*cols, F.col(ts_col).alias("ts"))
    )
    session_tz = docs.sparkSession.conf.get("spark.sql.session.timeZone")
    return keyed.groupBy("dedup_key").applyInPandasWithState(
        make_ttl_dedup_state_func(_duration_ms(state_ttl), tz=session_tz),
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_TTL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="EventTimeTimeout",
    )


def streaming_outage_summary(events: DataFrame) -> DataFrame:
    """Per-user cumulative outage counters over a stream of QoE state samples.

    ``events`` is a streaming DataFrame with columns
    (user_id long, ts timestamp, event_id long, state int). Each trigger
    emits one updated row per active key (output mode ``update``); the
    latest row per key (highest ``n_seen``) is the current summary and, on
    a fully consumed ordered stream, equals the batch
    :func:`..operators.sequences.qoe_outage_summary` counters exactly
    (tested in tests/test_stateful_streaming.py).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        outage_state_func,
        outputStructType=OUTAGE_OUTPUT_SCHEMA,
        stateStructType=OUTAGE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
