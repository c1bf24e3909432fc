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
