"""Skew-mitigation utilities: salted aggregation and salted broadcast join.

At 100 TB a handful of hot keys (one mega-customer, one degenerate dedup
bucket) can pin a whole stage on one task. AQE's skew-join handling covers
sort-merge joins; these helpers cover the two other hot paths:

- **Salted two-phase aggregation**: groupBy (key, salt) → partial → groupBy
  key → final. Turns one hot reducer into ``n_salts`` parallel ones. Only
  worth it for algebraic aggregates (sum/count/min/max) — which is what the
  engine's rollups use.
- **Salted broadcast-side explosion**: for joining a skewed fact against a
  small dim, the dim is exploded ``n_salts`` ways and the fact picks a
  deterministic salt — every fact row still matches exactly one dim row, but
  downstream per-key work is spread.

Salts are derived from stable columns with xxhash64 — deterministic across
runs and executors (never ``rand()``, which breaks retry idempotency).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(n_salts: int, *stable_cols: str | Column) -> Column:
    """Deterministic salt in [0, n_salts) from stable row content."""
    return F.pmod(F.xxhash64(*[F.col(c) if isinstance(c, str) else c for c in stable_cols]), F.lit(n_salts)).cast("int")


def salted_sum(
    df: DataFrame,
    key: str,
    value_aggs: dict[str, Column],
    n_salts: int = 16,
    salt_from: str | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    ``value_aggs`` maps output-column name → algebraic aggregate expression
    (sum/count/min/max — anything with a merge identity equal to itself).
    Phase 1 groups by (key, salt) with map-side combine; phase 2 merges the
    ``n_salts`` partials per key. The extra shuffle is tiny (n_keys × salts
    rows) and the hot key's reduce work spreads across ``n_salts`` tasks.

    Merge dispatch is VALIDATED against each expression's head aggregate
    (r7): a ``F.max(...)`` under a name without the ``_max`` suffix would
    silently re-merge partial maxima by SUM — plausible numbers, wrong
    answer — so a suffix/expression mismatch or a non-algebraic head
    (avg, countDistinct, …) raises instead.
    """
    import re

    salt = salt_col(n_salts, salt_from or key)
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(*[expr.alias(name) for name, expr in value_aggs.items()])
    )
    remerge = {
        "sum": F.sum,
        "count": F.sum,  # counts merge by summing partial counts
        "min": F.min,
        "max": F.max,
    }

    def merge(name: str, expr: Column) -> Column:
        # callers tag the merge op in the agg name suffix if not a sum;
        # default merge is sum (covers sum + count)
        tagged = next(
            (op for op in remerge if name.endswith(f"_{op}")), None
        )
        txt = str(expr).replace("Column<'", "").rstrip("'>")
        # DISTINCT aggregates are NOT algebraic under salting regardless of
        # the head function: count(DISTINCT x) / sum(DISTINCT x) partials
        # re-merged by SUM count a value once PER SALT it hashes into —
        # plausible but wrong. The head-op dispatch alone can't see this
        # (countDistinct's column name renders as plain "count(v)"), so
        # probe the ANALYZED single-expression plan, where the distinct
        # flag is rendered — one driver-side analyze, no job. Only the
        # FIRST line (the top Aggregate node, i.e. this expression itself)
        # is inspected: a distinct aggregate anywhere in df's LINEAGE
        # renders in child nodes and is irrelevant — salting a relation
        # derived from a countDistinct rollup is perfectly legal. Falls
        # back to the rendered-name check where the classic-JVM plan is
        # unreachable (Spark Connect).
        distinct = False
        try:
            probe = (
                df.select(expr.alias("__probe"))
                ._jdf.queryExecution()
                .analyzed()
                .toString()
            )
            distinct = "(distinct " in probe.splitlines()[0]
        except Exception:
            distinct = re.search(r"(?i)\bdistinct\b", txt) is not None
        if distinct:
            raise ValueError(
                f"salted_sum: {name!r} is a DISTINCT aggregate — per-salt "
                "distinct partials cannot be re-merged (a value appearing "
                "under multiple salts would be counted once per salt). Use "
                "an exact two-level countDistinct or a sketch instead"
            )
        # unwrap CAST(...)/TRY_CAST(...) shells around the aggregate
        head = re.match(r"(?i)^(?:(?:try_)?cast\()*\s*(\w+)\(", txt)
        head_op = head.group(1).lower() if head else None
        if head_op == "cast":
            head_op = None  # nested/odd shapes: stay permissive, as before
        # compare the selected re-merge FUNCTIONS, not suffix strings: a
        # sum aggregate named *_count (or a count named *_sum) re-merges
        # by F.sum either way and was always correct — only a suffix that
        # picks a genuinely different combiner (min/max crossed with
        # sum/count or each other) is a bug
        if (
            head_op in remerge
            and tagged is not None
            and remerge[tagged] is not remerge[head_op]
        ):
            raise ValueError(
                f"salted_sum: {name!r} is a {head_op} aggregate but its "
                f"_{tagged} suffix selects a {tagged} re-merge"
            )
        if head_op in ("min", "max") and tagged is None:
            raise ValueError(
                f"salted_sum: {name!r} is a {head_op} aggregate — name it "
                f"with the _{head_op} suffix or the partials re-merge by "
                "sum (silently wrong)"
            )
        if head_op is not None and head_op not in remerge:
            raise ValueError(
                f"salted_sum: {name!r} head aggregate {head_op!r} is not "
                "algebraic under salting (sum/count/min/max only) — its "
                "per-salt partials cannot be re-merged correctly"
            )
        return remerge[tagged or "sum"](name).alias(name)

    return partial.groupBy(key).agg(
        *[merge(n, e) for n, e in value_aggs.items()]
    )


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    fact_salt_from: str | None = None,
) -> DataFrame:
    """Equi-join a (possibly hot-keyed) fact against a small dim with the
    dim exploded per salt, so post-join partitioning by (key, salt) never
    concentrates a hot key on one task."""
    dim_salted = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    fact_salted = fact.withColumn(
        "__salt", salt_col(n_salts, fact_salt_from or key)
    )
    return fact_salted.join(F.broadcast(dim_salted), [key, "__salt"]).drop("__salt")
