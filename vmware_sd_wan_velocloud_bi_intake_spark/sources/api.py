"""JSON-RPC-style API source adapter (SURVEY.md §2.1 S1–S4, §2.9 T6–T7).

The reference's universal source is a JSON-RPC POST returning nested JSON
(``VCOClient.py:75-98``), with hand-rolled pushdowns: server-side projection
via ``with:`` lists (S3), time-interval predicates via ``interval:`` params
(S4), and row caps via ``limit``/``maxSamples`` (O2) — plus a 10-thread
fan-out over orchestrators (T6) and sleep-based rate limiting (T7).

Spark-first restatement:

- The endpoint list becomes a DataFrame partitioned across executors; each
  partition runs a ``mapInPandas`` fetcher — fan-out parallelism is Spark's
  task scheduling, not a thread pool (T6). At 1000 executors the same code
  fans out 1000-wide with locality and retry handled by the scheduler.
- Pushdown is explicit in the request builder: ``projection`` → ``with``,
  ``interval`` → ``interval``, ``limit`` → ``limit``. The transform layer
  never re-filters what the source already filtered.
- Rate limiting is a per-task token bucket (T7) — N tasks × rate budget
  replaces the reference's global sleeps.
- Results surface as a ``payload`` JSON string column; callers apply
  ``F.from_json(payload, schema)`` with an explicit nested StructType —
  schema-on-read with declared nullable schemas instead of the reference's
  try/except KeyError tolerance (SURVEY.md §1.4).

The transport is pluggable (`Callable[[method, params], object]`): production
wires an HTTPS client; tests and the demo pipeline use the deterministic
:mod:`fake_transport`.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

Transport = Callable[[str, dict], object]


class TokenBucket:
    """Minimal per-task rate limiter (T7): at most one call per ``interval_s``."""

    def __init__(self, interval_s: float):
        self.interval_s = interval_s
        self._last = 0.0

    def acquire(self) -> None:
        if self.interval_s <= 0:
            return
        now = time.monotonic()
        wait = self._last + self.interval_s - now
        if wait > 0:
            time.sleep(wait)
        self._last = time.monotonic()


def build_params(
    base_params: dict | None = None,
    projection: list[str] | None = None,
    interval: tuple[int, int] | None = None,
    limit: int | None = None,
) -> dict:
    """Assemble request params with the reference's pushdown conventions.

    projection → ``with`` (S3, powerbi_main_fun.py:181-182); interval →
    epoch-ms ``interval`` (S4, :470-472); limit → ``limit`` (:283).
    """
    params = dict(base_params or {})
    if projection is not None:
        params["with"] = list(projection)
    if interval is not None:
        params["interval"] = {"start": interval[0], "end": interval[1]}
    if limit is not None:
        params["limit"] = limit
    return params


def fetch_payloads(
    spark: SparkSession,
    endpoints: list[dict],
    method: str,
    params: dict,
    transport_factory: Callable[[], Transport],
    rate_limit_s: float = 0.0,
    max_parallelism: int = 10,
) -> DataFrame:
    """Fan the endpoint list across partitions and fetch one payload each.

    Returns columns (endpoint: string JSON, payload: string JSON). The
    transport factory runs once per task (connection reuse within a
    partition, like the reference's per-thread clients at
    ``powerbi_main_fun.py:99-102``).
    """
    import pandas as pd

    n_parts = max(1, min(len(endpoints), max_parallelism))
    eps = spark.createDataFrame(
        [(json.dumps(e, sort_keys=True),) for e in endpoints], "endpoint string"
    ).repartition(n_parts)

    method_ = method
    params_json = json.dumps(params, sort_keys=True)
    rl_s = rate_limit_s

    def fetch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        transport = transport_factory()
        bucket = TokenBucket(rl_s)
        req_params = json.loads(params_json)
        for pdf in batches:
            out_ep, out_pl = [], []
            for ep_json in pdf["endpoint"]:
                endpoint = json.loads(ep_json)
                bucket.acquire()
                result = transport(method_, {**req_params, "endpoint": endpoint})
                out_ep.append(ep_json)
                out_pl.append(json.dumps(result, sort_keys=True))
            yield pd.DataFrame({"endpoint": out_ep, "payload": out_pl})

    return eps.mapInPandas(fetch, schema="endpoint string, payload string")
