"""External-service enrichment UDFs (SURVEY.md §2.10 U1/U2).

The reference calls Nominatim reverse-geocoding and a MaxMind IP-insights
service row-at-a-time with 10 s quota sleeps (``powerbi_main_fun.py:624-653``,
``:736-745``). Engine restatement:

- ``mapInPandas`` batch UDF with a pluggable client, per-partition
  connection reuse, an in-task LRU cache (repeat keys within a batch hit the
  cache, mirroring the reference's already-set checks), and a token-bucket
  rate limiter.
- The default client is a deterministic offline fake (md5-derived) so tests
  and the catalog query are hermetic; production swaps in a real HTTP client
  without touching the operator.

Scale note: enrichment results are a slowly-changing dimension — at 100 TB
you enrich the *distinct* key set (dropDuplicates first), persist the lookup
table, and broadcast-join it back; this operator is that distinct-key step.

Production client (documented, not shipped — this sandbox has no network,
so an HTTP client here would be untestable dead code). The reference's
Nominatim call (``powerbi_main_fun.py:624-653``) plugs in as a
``lookup_factory`` like::

    def nominatim_factory(user_agent: str, timeout_s: float = 10.0):
        def build():
            import json, urllib.request

            def lookup(key: str) -> str:
                lat, lon = key.split(",")
                req = urllib.request.Request(
                    "https://nominatim.openstreetmap.org/reverse"
                    f"?lat={lat}&lon={lon}&format=jsonv2",
                    headers={"User-Agent": user_agent},
                )
                with urllib.request.urlopen(req, timeout=timeout_s) as r:
                    return json.load(r)["address"].get("country_code", "??")

            return lookup

        return build

    enrich_region(df, "latlon", nominatim_factory("my-pipeline/1.0"),
                  rate_limit_s=1.0)   # Nominatim's published usage policy

The operator supplies everything the client must NOT re-implement:
per-task construction (connection reuse), the in-task LRU, the token
bucket, and Arrow batching. A MaxMind GeoIP2 web-service client is the
same shape with a different URL/parse.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame

REGIONS = ["AMER", "EMEA", "APAC", "LATAM"]


def fake_region_lookup(key: str) -> str:
    """Deterministic offline stand-in for a geo service (md5-bucketed)."""
    h = hashlib.md5(key.encode()).hexdigest()
    return REGIONS[int(h[:2], 16) % len(REGIONS)]


def enrich_region(
    df: DataFrame,
    key: str,
    lookup_factory: Callable[[], Callable[[str], str]] | None = None,
    rate_limit_s: float = 0.0,
) -> DataFrame:
    """Append ``region`` by looking up ``key`` against an external service.

    ``lookup_factory`` builds the client once per task (like the reference's
    per-thread sessions); defaults to the offline fake.
    """
    import pandas as pd

    from ..sources.api import TokenBucket

    factory = lookup_factory or (lambda: fake_region_lookup)
    rl = rate_limit_s
    out_schema = ", ".join(
        f"{name} {dtype}" for name, dtype in df.dtypes
    ) + ", region string"

    def enrich(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = factory()
        bucket = TokenBucket(rl)
        cache: dict[str, str] = {}
        for pdf in batches:
            regions = []
            for k in pdf[key].astype(str):
                if k not in cache:
                    bucket.acquire()
                    cache[k] = client(k)
                regions.append(cache[k])
            yield pdf.assign(region=regions)

    return df.mapInPandas(enrich, schema=out_schema)
