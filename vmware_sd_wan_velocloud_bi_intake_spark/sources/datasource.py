"""Custom Python DataSource for the VeloCloud-shaped API (SURVEY §2.1 S1–S4).

``sources/api.py`` is the thin `mapInPandas` fetch layer; this is the
full-citizen form SURVEY §4 calls for at scale: a ``spark.dataSource``
registration so API reads are planned like any other scan —

- **Partitioning (T6)**: one input partition per (vco, enterprise), so a
  1000-executor cluster fans the fleet out through the task scheduler (the
  reference hand-rolls this with a 10-thread pool,
  ``powerbi_main_script.py:85-93``).
- **Filter pushdown (S4)**: ``pushFilters`` consumes time-range predicates on
  ``event_ts`` and equality/membership predicates on ``edgeState`` and turns
  them into the API's ``interval:`` parameter / server-side state filter (the
  reference builds these by hand, ``powerbi_main_fun.py:470-472``). Consumed
  filters are NOT re-evaluated by Spark; unsupported ones are retained.
- **Projection push (S3)**: the ``projection`` option becomes the API's
  ``with:`` list (``powerbi_main_fun.py:181-182``); unprojected nested
  columns surface as null without transport cost.
- **Limit push (O2)**: the ``limit`` option caps rows per enterprise at the
  transport, the analog of ``maxSamples: 200`` (``powerbi_main_fun.py:1908``).

The transport is pluggable via the ``transport`` option — a
``module:callable`` path resolved on executors (hermetic default:
:mod:`fake_transport`). Production would point it at an HTTPS JSON-RPC
client; nothing else changes.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass
from importlib import import_module
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

EDGE_SCHEMA = (
    "vco string, enterprise_id long, id long, logicalId string, name string, "
    "edgeState string, buildNumber string, activationTime string, "
    "lastContact string, "
    "site struct<lat double, lon double, city string, country string, "
    "postalCode string>, "
    "recentLinks array<struct<internalId string, ipAddress string, "
    "networkType string, backupState string, bytesRx long, bytesTx long, "
    "scoreRx double, scoreTx double>>, "
    "licenses array<struct<sku string, start string, end string, "
    "active boolean>>"
)
EVENT_SCHEMA = (
    "vco string, enterprise_id long, event_ts timestamp, event string, "
    "edgeLogicalId string"
)

_EPOCH = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)


def _to_ms(v) -> tuple[int, bool]:
    """(floor-ms epoch value, exactly-representable-at-ms).

    The API interval is millisecond-grained while ``event_ts`` carries
    microsecond precision (strptime ``%f``), so a pushed bound is only a
    *consumable* substitute for the predicate when the literal sits exactly
    on a millisecond; otherwise the interval is an over-approximation and
    Spark must re-apply the original filter.
    """
    if isinstance(v, dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=dt.timezone.utc)
        us = (v - _EPOCH) // dt.timedelta(microseconds=1)
        return us // 1000, us % 1000 == 0
    return int(v), True


def _attr(f: Filter) -> str:
    return ".".join(f.attribute)


def _default_transport():
    from .fake_transport import FakeVcoTransport

    return FakeVcoTransport()


def _resolve_transport(spec: str | None):
    if not spec:
        return _default_transport()
    mod_name, _, fn_name = spec.partition(":")
    return getattr(import_module(mod_name), fn_name)()


@dataclass
class FleetPartition(InputPartition):
    vco: str
    enterprise_id: int


class VeloCloudReader(DataSourceReader):
    def __init__(self, entity: str, options: dict):
        self.entity = entity
        self.fleet = [v for v in options.get("fleet", "vco0").split(",") if v]
        self.n_enterprises = int(options.get("n_enterprises", "5"))
        self.projection = [
            p for p in options.get("projection", "").split(",") if p
        ]
        self.limit = int(options["limit"]) if "limit" in options else None
        self.transport_spec = options.get("transport")
        # projection entries droppable by the S2 degrade-and-retry path
        self.degradable = [
            d for d in options.get("degradable", "licenses").split(",") if d
        ]
        # pushed-down state, filled by pushFilters during planning
        self.interval_start_ms: int | None = None
        self.interval_end_ms: int | None = None
        self.edge_states: list[str] | None = None

    # -- planning ----------------------------------------------------------
    def _narrow_start(self, ms: int) -> None:
        # conjunction of lower bounds → the TIGHTEST (max) wins; a second
        # pushed filter must never widen a bound a prior filter set
        self.interval_start_ms = (
            ms if self.interval_start_ms is None else max(self.interval_start_ms, ms)
        )

    def _narrow_end(self, ms: int) -> None:
        self.interval_end_ms = (
            ms if self.interval_end_ms is None else min(self.interval_end_ms, ms)
        )

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Push range predicates into the API interval.

        A filter is CONSUMED (not re-evaluated by Spark) only when the
        ms-grained interval expresses it exactly: ``>=`` / ``<`` on an
        ms-aligned literal. Everything else still narrows the interval as an
        over-approximation but is re-yielded so Spark applies the exact
        predicate post-scan (``>`` and ``<=`` can admit sub-ms rows at the
        boundary regardless of literal alignment).
        """
        for f in filters:
            if self.entity == "events" and _attr(f) == "event_ts":
                if isinstance(f, GreaterThanOrEqual):
                    ms, exact = _to_ms(f.value)
                    self._narrow_start(ms)
                    if exact:
                        continue
                elif isinstance(f, GreaterThan):
                    ms, _ = _to_ms(f.value)
                    self._narrow_start(ms)  # approximate: keeps ts == floor(v)
                elif isinstance(f, LessThan):
                    ms, exact = _to_ms(f.value)
                    self._narrow_end(ms if exact else ms + 1)
                    if exact:
                        continue
                elif isinstance(f, LessThanOrEqual):
                    ms, _ = _to_ms(f.value)
                    self._narrow_end(ms + 1)  # approximate: admits (v, v+1ms)
            if self.entity == "edges" and _attr(f) == "edgeState":
                if isinstance(f, EqualTo):
                    self.edge_states = [f.value]
                    continue
                if isinstance(f, In):
                    self.edge_states = list(f.values)
                    continue
            yield f  # not pushable — Spark evaluates it post-scan

    def partitions(self) -> list[FleetPartition]:
        return [
            FleetPartition(vco=v, enterprise_id=e)
            for v in self.fleet
            for e in range(self.n_enterprises)
        ]

    # -- execution (runs on executors) -------------------------------------
    def read(self, part: FleetPartition) -> Iterator[tuple]:
        transport = _resolve_transport(self.transport_spec)
        endpoint = {"vco": part.vco, "enterpriseId": part.enterprise_id}
        if self.entity == "edges":
            yield from self._read_edges(transport, part, endpoint)
        elif self.entity == "events":
            yield from self._read_events(transport, part, endpoint)
        else:
            raise ValueError(f"unknown entity: {self.entity}")

    def _read_edges(self, transport, part, endpoint) -> Iterator[tuple]:
        params: dict = {"endpoint": endpoint, "with": self.projection}
        if self.edge_states is not None:
            # API-side state predicate: applied before rows leave the source
            params["filter"] = {"edgeState": self.edge_states}
        # S2 degrade-and-retry (Functions/vco_calls.py:178-199): a failed
        # heavy call retries with the degradable sub-objects dropped from
        # the projection, so one heavy column failing cannot silently lose
        # the whole enterprise's rows — they arrive with those columns null
        # (from_json-style absence), the same contract the reference's
        # "got without license" path provides. Failures degradation cannot
        # answer raise out of _call_with_degrade: a visible task error,
        # never a silently empty partition. The schema has no status
        # column, so a successful degradation is recorded to the executor
        # log (the reference logs its msg the same way).
        import logging

        from .api import _call_with_degrade

        edges, status = _call_with_degrade(
            transport, "enterprise/getEnterpriseEdges", params, self.degradable
        )
        if status is not None:
            logging.getLogger(__name__).warning("%s: %s", endpoint, status)
        for e in edges:
            if self.edge_states is not None and e.get("edgeState") not in self.edge_states:
                continue  # transports without server-side filters still honor the contract
            site = e.get("site")
            yield (
                part.vco,
                part.enterprise_id,
                e.get("id"),
                e.get("logicalId"),
                e.get("name"),
                e.get("edgeState"),
                e.get("buildNumber"),
                e.get("activationTime"),
                e.get("lastContact"),
                (
                    site["lat"],
                    site["lon"],
                    site["city"],
                    site["country"],
                    site["postalCode"],
                )
                if site
                else None,
                [
                    (
                        l.get("internalId"),
                        l.get("ipAddress"),
                        l.get("networkType"),
                        l.get("backupState"),
                        l.get("bytesRx"),
                        l.get("bytesTx"),
                        l.get("scoreRx"),
                        l.get("scoreTx"),
                    )
                    for l in e.get("recentLinks", [])
                ]
                if "recentLinks" in e
                else None,
                [
                    (li.get("sku"), li.get("start"), li.get("end"), li.get("active"))
                    for li in e.get("licenses", [])
                ]
                if "licenses" in e
                else None,
            )

    def _read_events(self, transport, part, endpoint) -> Iterator[tuple]:
        params: dict = {"endpoint": endpoint}
        start = 0 if self.interval_start_ms is None else self.interval_start_ms
        end = 10**15 if self.interval_end_ms is None else self.interval_end_ms
        params["interval"] = {"start": start, "end": end}
        if self.limit is not None:
            params["limit"] = self.limit
        result = transport("event/getEnterpriseEvents", params)
        for ev in result["data"]:
            ts = dt.datetime.strptime(
                ev["eventTime"], "%Y-%m-%dT%H:%M:%S.%fZ"
            ).replace(tzinfo=dt.timezone.utc)
            yield (part.vco, part.enterprise_id, ts, ev["event"], ev["edgeLogicalId"])


@dataclass
class StreamSlice(InputPartition):
    """One micro-batch task: one (vco, enterprise) over one time window."""

    vco: str
    enterprise_id: int
    start_ms: int
    end_ms: int


class VeloCloudStreamReader(DataSourceStreamReader):
    """Structured Streaming source over the event API (SURVEY §2.9).

    The reference's scheduled incremental batch with per-entity lookback
    windows (``powerbi_main_fun.py:469-475``) restated as a real streaming
    source: the offset is the event-time watermark in epoch-ms; each
    micro-batch advances it by ``advance_ms`` (capped at ``end_ms`` so
    bounded replays terminate), and ``partitions(start, end)`` fans the
    window out as one task per (vco, enterprise) — executor-parallel, not a
    driver loop. Offsets are exact interval bounds, so replaying a batch
    after failure re-fetches the identical rows (the transport's interval
    filter is the idempotency contract).
    """

    def __init__(self, options: dict):
        self.fleet = [v for v in options.get("fleet", "vco0").split(",") if v]
        self.n_enterprises = int(options.get("n_enterprises", "5"))
        self.start_ms = int(options.get("start_ms", "1704067200000"))
        self.advance_ms = int(options.get("advance_ms", str(24 * 3600 * 1000)))
        self.cap_ms = int(options.get("end_ms", str(2**53)))
        self.transport_spec = options.get("transport")
        self._latest = self.start_ms
        # high-water mark of committed progress, learned from the start
        # offsets Spark hands partitions(); slice starts clamp to it so an
        # offset-log rewind after restart can never re-deliver a window
        self._floor = self.start_ms

    def initialOffset(self) -> dict:
        return {"ms": self.start_ms}

    def latestOffset(self) -> dict:
        self._latest = min(self._latest + self.advance_ms, self.cap_ms)
        return {"ms": self._latest}

    def partitions(self, start: dict, end: dict) -> list[StreamSlice]:
        # After a checkpoint restart this reader object is fresh, so _latest
        # regresses behind the committed offset. Two guards make restarts
        # replay-free regardless of call order:
        # 1. _latest clamps forward from the committed start Spark hands us,
        #    so subsequent latestOffset() calls are monotone.
        # 2. When the FIRST post-restart call was latestOffset() (last batch
        #    committed), its regressed value lands in the offset log and the
        #    next batch's start rewinds behind the true progress; _floor —
        #    the max committed start ever observed — clamps every slice
        #    start, so the rewound span [start, _floor) is never re-fetched
        #    (an inverted/empty interval yields no rows at the transport).
        eff_start = max(start["ms"], self._floor)
        self._floor = eff_start
        self._latest = max(self._latest, eff_start)
        return [
            StreamSlice(vco=v, enterprise_id=e, start_ms=eff_start, end_ms=end["ms"])
            for v in self.fleet
            for e in range(self.n_enterprises)
        ]

    def read(self, part: StreamSlice) -> Iterator[tuple]:
        transport = _resolve_transport(self.transport_spec)
        result = transport(
            "event/getEnterpriseEvents",
            {
                "endpoint": {"vco": part.vco, "enterpriseId": part.enterprise_id},
                "interval": {"start": part.start_ms, "end": part.end_ms},
            },
        )
        for ev in result["data"]:
            ts = dt.datetime.strptime(
                ev["eventTime"], "%Y-%m-%dT%H:%M:%S.%fZ"
            ).replace(tzinfo=dt.timezone.utc)
            yield (part.vco, part.enterprise_id, ts, ev["event"], ev["edgeLogicalId"])

    def commit(self, end: dict) -> None:
        # offsets are pure interval bounds; nothing to acknowledge upstream
        pass


class VeloCloudDataSource(DataSource):
    """``spark.read.format("velocloud")`` — options:

    entity        edges | events (default edges)
    fleet         comma-separated VCO names (default "vco0")
    n_enterprises enterprises per VCO (fleet discovery in production)
    projection    comma-separated nested sub-objects → API ``with:``
    limit         per-enterprise row cap → API ``limit``
    transport     "module:callable" transport factory (default fake)
    """

    @classmethod
    def name(cls) -> str:
        return "velocloud"

    def schema(self) -> str:
        entity = self.options.get("entity", "edges")
        return EDGE_SCHEMA if entity == "edges" else EVENT_SCHEMA

    def reader(self, schema) -> VeloCloudReader:
        return VeloCloudReader(self.options.get("entity", "edges"), dict(self.options))

    def streamReader(self, schema) -> VeloCloudStreamReader:
        if self.options.get("entity", "events") != "events":
            raise ValueError("streaming is supported for entity=events only")
        return VeloCloudStreamReader(dict(self.options))
