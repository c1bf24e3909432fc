"""Event / time-series query catalog: window & sequence analytics (W1–W5),
temporal keys (F10–F13), top-k (A11), dedup-on-append (T4), and the A9
order-dependent score fold (intended + quirk-compat modes).

Fixture mapping (FIXTURES.md §2): the reference's per-link QoE sample arrays
map to ``events`` ordered by ``ts`` per ``user_id``; ``value`` is discretized
onto the QoE state codes {0,2,3,4}.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import dec
from ..functions.temporal import month_key
from ..operators.sequences import (
    discretize_state,
    qoe_outage_summary,
    transition_counts,
    run_lengths,
    tumbling_min_score,
)
from ..sources.tables import load_table
from .base import Q

# Shared: deterministic per-user ordering (ts then event_id tiebreak).
ORDER = ["ts", "event_id"]


def _with_state(events: DataFrame) -> DataFrame:
    return events.withColumn("state", discretize_state(F.col("value")))


# --------------------------------------------------------------------------
# W1/W2: brownout + blackout transition detection via lag.
# Reference: CalculateBrownouts/Blackouts powerbi_main_fun.py:1709-1775.
# --------------------------------------------------------------------------
def w01_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _with_state(load_table(spark, sf_dir, "events"))
    return transition_counts(ev, "user_id", ORDER)


W01_ORACLE = """
WITH staged AS (
  SELECT
    user_id,
    CASE WHEN value < 50.0 THEN 0
         WHEN value < 100.0 THEN 2
         WHEN value < 150.0 THEN 3
         ELSE 4 END AS state,
    LAG(CASE WHEN value < 50.0 THEN 0
             WHEN value < 100.0 THEN 2
             WHEN value < 150.0 THEN 3
             ELSE 4 END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_state
  FROM events
)
SELECT
  user_id,
  CAST(SUM(CASE WHEN state = 2 AND prev_state = 4 THEN 1 ELSE 0 END) AS BIGINT) AS brownouts,
  CAST(SUM(CASE WHEN state = 0 AND prev_state IS NOT NULL AND prev_state <> 0
                THEN 1 ELSE 0 END) AS BIGINT) AS blackouts
FROM staged
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# W3/F15: gaps-and-islands run lengths of the degraded (red) state.
# Reference: run extension loops powerbi_main_fun.py:1727-1735; 7.12-min
# sample duration :1875-1882.
# --------------------------------------------------------------------------
def w03_runlengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _with_state(load_table(spark, sf_dir, "events"))
    runs = run_lengths(ev, "user_id", ORDER).filter(F.col("state") == 2)
    return runs.groupBy("user_id").agg(
        F.count("*").alias("n_red_runs"),
        F.max("run_len").alias("max_run_len"),
        F.sum("run_len").cast("long").alias("total_red_samples"),
        # duration in minutes at 7.12 min/sample, exact: n*712 then one division
        (
            (F.max("run_len") * F.lit(712)).cast("double") / F.lit(100.0)
        ).alias("max_run_minutes"),
    )


W03_ORACLE = """
WITH staged AS (
  SELECT
    user_id, ts, event_id,
    CASE WHEN value < 50.0 THEN 0
         WHEN value < 100.0 THEN 2
         WHEN value < 150.0 THEN 3
         ELSE 4 END AS state
  FROM events
), islands AS (
  SELECT
    user_id, state,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      - ROW_NUMBER() OVER (PARTITION BY user_id, state ORDER BY ts, event_id) AS island_id
  FROM staged
), runs AS (
  SELECT user_id, state, island_id, COUNT(*) AS run_len
  FROM islands GROUP BY user_id, state, island_id
)
SELECT
  user_id,
  COUNT(*) AS n_red_runs,
  MAX(run_len) AS max_run_len,
  CAST(SUM(run_len) AS BIGINT) AS total_red_samples,
  CAST(MAX(run_len) * 712 AS DOUBLE) / 100.0 AS max_run_minutes
FROM runs
WHERE state = 2
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# W1+W2+W3 faithful composite: brownout/blackout counts AND durations with
# the reference's island-predecessor semantics (duration = full run length
# of the degraded island that a qualifying transition opens).
# Reference: CalculateBrownouts/Blackouts powerbi_main_fun.py:1709-1775,
# summation over start-states :1855-1879, 7.12-min samples :1875-1882.
# --------------------------------------------------------------------------
def w02_outage_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _with_state(load_table(spark, sf_dir, "events"))
    return qoe_outage_summary(ev, "user_id", ORDER)


W02_ORACLE = """
WITH staged0 AS (
  SELECT user_id, ts, event_id,
         CASE WHEN value < 50.0 THEN 0
              WHEN value < 100.0 THEN 2
              WHEN value < 150.0 THEN 3
              ELSE 4 END AS state
  FROM events
), staged AS (
  SELECT user_id, state,
         LAG(state) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_state,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - ROW_NUMBER() OVER (PARTITION BY user_id, state ORDER BY ts, event_id)
           AS island_id
  FROM staged0
), islands AS (
  SELECT user_id, state, island_id, COUNT(*) AS run_len,
         MAX(CASE WHEN prev_state IS NULL OR prev_state <> state
                  THEN prev_state END) AS island_prev
  FROM staged GROUP BY 1, 2, 3
)
SELECT
  user_id,
  CAST(SUM(CASE WHEN state = 2 AND island_prev = 4 THEN 1 ELSE 0 END) AS BIGINT)
    AS brownouts,
  CAST(SUM(CASE WHEN state = 2 AND island_prev = 4 THEN run_len ELSE 0 END) AS BIGINT)
    AS brownout_samples,
  CAST(SUM(CASE WHEN state = 2 AND island_prev = 4 THEN run_len ELSE 0 END) * 712
       AS DOUBLE) / 6000.0 AS brownout_minutes,
  CAST(SUM(CASE WHEN state = 0 AND island_prev IS NOT NULL AND island_prev <> 0
                THEN 1 ELSE 0 END) AS BIGINT) AS blackouts,
  CAST(SUM(CASE WHEN state = 0 AND island_prev IS NOT NULL AND island_prev <> 0
                THEN run_len ELSE 0 END) AS BIGINT) AS blackout_samples,
  CAST(SUM(CASE WHEN state = 0 AND island_prev IS NOT NULL AND island_prev <> 0
                THEN run_len ELSE 0 END) * 712 AS DOUBLE) / 6000.0 AS blackout_minutes
FROM islands
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# A14: max-aggregates over a metric time-series per entity — the gateway
# status-metrics shape (getGatewayStatusMetrics takes server-side max of
# cpuPct/memoryPct/flowCount over 24 h; gateway_script.py:252-262). Here
# the raw series is ingested and the max/min/count computed engine-side,
# grouped per (user, metric) — one shuffle, map-side partial aggregates.
# --------------------------------------------------------------------------
def a14_series_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.max("value").alias("max_value"),
        F.min("value").alias("min_value"),
        F.count("*").cast("long").alias("n_samples"),
    )


A14_ORACLE = """
SELECT user_id, event_type,
       MAX(value) AS max_value,
       MIN(value) AS min_value,
       COUNT(*) AS n_samples
FROM events
GROUP BY user_id, event_type
"""


# --------------------------------------------------------------------------
# P1/P3–P6/P10: the reference's row-gate family in one pass —
#   P3 null-key skip          (powerbi_main_fun.py:447-449)
#   P4 state gate             (CONNECTED filter, :456-460)
#   P5 skip-list              (events_to_skip, :845-851)
#   P6 flag-list membership   (outdatedversion/eoslversion, :944-1014)
#   P10 sentinel-value class  (lat==37.402866 ⇒ 'private', :1548-1551)
#   P1 single-entity debug    (data_sanitization.py:51-53; off by default)
# All land below the parquet scan as PushedFilters; the flag columns are
# literal-set membership (broadcast-free, constant-folded).
# --------------------------------------------------------------------------
def p03_event_gates(
    spark: SparkSession, sf_dir: str, debug_user: int | None = None
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    if debug_user is not None:  # P1 debug gate
        ev = ev.filter(F.col("user_id") == F.lit(debug_user))
    skip_list = ["view"]  # P5 analog of events_to_skip
    flag_list = ["error", "signup"]  # P6 analog of outdated-version lists
    return (
        ev.filter(F.col("user_id").isNotNull())  # P3
        .filter(F.col("event_type") != "click")  # P4 state gate
        .filter(~F.col("event_type").isin(skip_list))  # P5
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.col("event_type").isin(flag_list).alias("is_flagged"),  # P6
            F.when(F.col("value") < F.lit(50.0), F.lit("degraded"))  # P10
            .otherwise(F.lit("normal"))
            .alias("value_class"),
        )
    )


P03_ORACLE = """
SELECT event_id, user_id, event_type,
       event_type IN ('error', 'signup') AS is_flagged,
       CASE WHEN value < 50.0 THEN 'degraded' ELSE 'normal' END AS value_class
FROM events
WHERE user_id IS NOT NULL
  AND event_type <> 'click'
  AND event_type NOT IN ('view')
"""


# --------------------------------------------------------------------------
# W7 (beyond-ref window op): gap-based sessionization. The reference has no
# session windows (SURVEY.md §2.5 notes the absence); a training-data /
# clickstream pipeline needs them. Classic two-window formulation: lag →
# new-session flag → running sum = session id → per-session aggregates.
# One shuffle on user_id; both windows share the same partitioning.
# --------------------------------------------------------------------------
SESSION_GAP_MIN = 30


def w07_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts"))
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            (ms - F.lag(ms).over(w)) > SESSION_GAP_MIN * 60 * 1000, 1
        )
        .otherwise(0)
        .cast("long"),
    ).withColumn(
        "session_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return flagged.groupBy("user_id", "session_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.max(ms) - F.min(ms)).cast("long").alias("duration_ms"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_purchases"),
    )


W07_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_ms(ts) - epoch_ms(LAG(ts) OVER
                (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), sess AS (
  SELECT *, SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       CAST(epoch_ms(MAX(ts)) - epoch_ms(MIN(ts)) AS BIGINT) AS duration_ms,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_purchases
FROM sess GROUP BY user_id, session_id
"""


# --------------------------------------------------------------------------
# W4/A12: tumbling-hour mean score, daily minimum.
# Reference: lowest_qoe powerbi_main_fun.py:1778-1804.
# --------------------------------------------------------------------------
def w04_hourly_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = tumbling_min_score(ev, "user_id", "ts", "value")
    return out.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "min_hour_score",
        "n_hours",
    )


W04_ORACLE = """
WITH hourly AS (
  SELECT
    user_id,
    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
    date_trunc('hour', ts) AS hour,
    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS hour_score
  FROM events
  GROUP BY 1, 2, 3
)
SELECT user_id, day, MIN(hour_score) AS min_hour_score, COUNT(*) AS n_hours
FROM hourly
GROUP BY user_id, day
"""


# --------------------------------------------------------------------------
# T4/F10: month-truncated idempotent dedup of the event stream.
# Reference: events unique (Date, EdgeID, Name) + INSERT IGNORE
# powerbi_main_fun.py:886-887, customer.sql:354-355.
# --------------------------------------------------------------------------
def t04_month_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(month_key("ts"), "yyyy-MM-dd").alias("month"),
            F.col("user_id"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_raw_events"),
            F.min("event_id").alias("first_event_id"),
        )
    )


T04_ORACLE = """
SELECT
  strftime(date_trunc('month', ts), '%Y-%m-%d') AS month,
  user_id,
  event_type,
  COUNT(*) AS n_raw_events,
  MIN(event_id) AS first_event_id
FROM events
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# A11/O1: top-k per key by ordered rank.
# Reference: top-1/5/10 throughput samples powerbi_main_fun.py:1970-1978.
# --------------------------------------------------------------------------
def a11_topk_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("user_id", "event_id", "value", "rk")
    )


A11_ORACLE = """
SELECT user_id, event_id, value, rk
FROM (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rk
  FROM events
)
WHERE rk <= 3
"""


# --------------------------------------------------------------------------
# W5/T3: idempotent backfill — expected (user, day) grid anti-join existing.
# Reference: update_edge_qoe 30-day backfill powerbi_main_fun.py:1890-1921,
# missing-day probe fun_mysql_query.py:63-77.
# --------------------------------------------------------------------------
def w05_backfill_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    grid = users.withColumn(
        "day",
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"), F.lit("2024-01-31").cast("date")
            )
        ),
    )
    existing = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).distinct()
    missing = grid.join(existing, ["user_id", "day"], "left_anti")
    return missing.select(
        "user_id", F.date_format("day", "yyyy-MM-dd").alias("day")
    )


W05_ORACLE = """
WITH users AS (SELECT DISTINCT user_id FROM events),
days AS (
  SELECT CAST(d AS DATE) AS day
  FROM generate_series(DATE '2024-01-01', DATE '2024-01-31', INTERVAL 1 DAY) AS t(d)
),
grid AS (SELECT user_id, day FROM users CROSS JOIN days),
existing AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
)
SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day
FROM grid g
WHERE NOT EXISTS (
  SELECT 1 FROM existing e WHERE e.user_id = g.user_id AND e.day = g.day
)
"""


# --------------------------------------------------------------------------
# A9 (intended semantics): the reference's Score metric as documented intent —
# avg(value) * 12.5 (see SURVEY.md §2.4 A9; reference powerbi_main_fun.py:2048).
# --------------------------------------------------------------------------
def a09_score_intended(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        (
            F.sum(dec("value")).cast("double")
            / F.count("value")
            * F.lit(12.5)
        ).alias("score"),
        F.count("*").alias("n_samples"),
    )


A09_ORACLE = """
SELECT
  user_id,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) * 12.5 AS score,
  COUNT(*) AS n_samples
FROM events
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# A9 (quirk-compat): the literal order-dependent fold
#   score_{k} = ((score_{k-1} * (k-1)) + v_k) * 12.5 / k
# reproduced with an ordered collect + ``aggregate`` fold. Exercised as a
# rows-only check (no SQL oracle): the fold is numerically ill-conditioned by
# design (12.5× per step), exactly why SURVEY.md flags it.
# --------------------------------------------------------------------------
def a09_score_quirk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("value")))
        ).alias("samples")
    )
    folded = F.aggregate(
        F.col("samples"),
        F.struct(
            F.lit(0.0).alias("score"), F.lit(0).cast("long").alias("n")
        ),
        lambda acc, s: F.struct(
            (
                ((acc["score"] * acc["n"].cast("double")) + s["value"])
                * F.lit(12.5)
                / (acc["n"] + 1).cast("double")
            ).alias("score"),
            (acc["n"] + 1).alias("n"),
        ),
    )
    return seq.select(
        "user_id",
        folded["score"].alias("score_quirk"),
        folded["n"].alias("n_samples"),
    )


# --------------------------------------------------------------------------
# P15 (beyond-ref API surface): pivot — long event rows to a wide per-user
# matrix. The EAV pivot (eav_pivot) builds a map; this is the relational
# .pivot() with explicit values, so the column set is fixed at plan time
# (dynamic-value pivots need a pre-pass distinct — the explicit list keeps
# one job and deterministic schema, which is also why the oracle can match).
# --------------------------------------------------------------------------
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def p15_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
        .withColumnRenamed("click", "n_click")
        .withColumnRenamed("error", "n_error")
        .withColumnRenamed("purchase", "n_purchase")
        .withColumnRenamed("signup", "n_signup")
        .withColumnRenamed("view", "n_view")
    )


P15_ORACLE = """
SELECT user_id,
       COUNT(*) FILTER (event_type = 'click')    AS n_click,
       COUNT(*) FILTER (event_type = 'error')    AS n_error,
       COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (event_type = 'signup')   AS n_signup,
       COUNT(*) FILTER (event_type = 'view')     AS n_view
FROM events
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# W8 (beyond-ref): time-RANGE window frame — rolling 7-day sum/count per
# user. The reference computes lookbacks by re-fetching fixed intervals
# (W5/W6); the RANGE frame expresses "trailing window per row" natively:
# one shuffle on the partition key, frame bounds evaluated on the sorted
# run. Ordering key is epoch seconds (Spark range frames need numeric
# order); the oracle uses the equivalent INTERVAL range frame.
# --------------------------------------------------------------------------
def w08_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-7 * 86400, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(dec("value", 18)).over(w).cast("double").alias("sum_7d"),
        F.count(F.lit(1)).over(w).alias("n_7d"),
    )


W08_ORACLE = """
SELECT event_id, user_id, ts,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_7d,
       COUNT(*) OVER w AS n_7d
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts
  RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
)
"""



QUERIES: dict[str, Q] = {
    "w08_rolling_window": Q(
        w08_rolling_window,
        W08_ORACLE,
        ("W5", "F13"),
        "time-RANGE frame: rolling 7-day sum/count per user",
    ),
    "p15_event_pivot": Q(
        p15_event_pivot,
        P15_ORACLE,
        ("P7", "A5"),
        "explicit-values pivot: long events to wide per-user count matrix",
    ),
    "w01_transitions": Q(
        w01_transitions,
        W01_ORACLE,
        ("W1", "W2"),
        "brownout/blackout state-transition detection via lag",
    ),
    "w02_outage_summary": Q(
        w02_outage_summary,
        W02_ORACLE,
        ("W1", "W2", "W3", "F15"),
        "brownout/blackout counts + island-length durations (faithful spec)",
    ),
    "a14_series_max": Q(
        a14_series_max,
        A14_ORACLE,
        ("A14",),
        "max/min aggregates over metric time-series per entity",
    ),
    "p03_event_gates": Q(
        p03_event_gates,
        P03_ORACLE,
        ("P1", "P3", "P4", "P5", "P6", "P10"),
        "row-gate family: null-key, state, skip-list, flag-list, sentinel",
    ),
    "w07_sessionize": Q(
        w07_sessionize,
        W07_ORACLE,
        ("W1", "W3", "beyond:sessionize"),
        "gap-based sessionization: lag flag -> running-sum ids -> session aggs",
    ),
    "w03_runlengths": Q(
        w03_runlengths,
        W03_ORACLE,
        ("W3", "F15"),
        "gaps-and-islands degraded-state run lengths",
    ),
    "w04_hourly_min": Q(
        w04_hourly_min,
        W04_ORACLE,
        ("W4", "A12", "F11"),
        "tumbling-hour score, daily minimum",
    ),
    "t04_month_dedup": Q(
        t04_month_dedup,
        T04_ORACLE,
        ("T4", "F10", "S10"),
        "month-key idempotent event dedup",
    ),
    "a11_topk_per_user": Q(
        a11_topk_per_user, A11_ORACLE, ("A11", "O1", "O2"), "top-k per key by rank"
    ),
    "w05_backfill_missing": Q(
        w05_backfill_missing,
        W05_ORACLE,
        ("W5", "T3", "J7"),
        "idempotent daily-backfill key grid via anti-join",
    ),
    "a09_score_intended": Q(
        a09_score_intended,
        A09_ORACLE,
        ("A9",),
        "Score metric, intended semantics (avg*12.5)",
    ),
    "a09_score_quirk": Q(
        a09_score_quirk,
        None,  # order-dependent fold: rows-only check by design
        ("A9", "U3"),
        "Score metric, quirk-compat ordered fold",
    ),
}
