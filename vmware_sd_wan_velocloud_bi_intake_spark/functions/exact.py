"""Exact-arithmetic Column helpers.

The reference coerces monetary/metric values through a 6-digit ``Decimal``
context (reference ``Functions/helpers.py:18-20``). We generalize that into a
decimal-exact aggregation discipline: cast double inputs to ``DECIMAL`` before
arithmetic/aggregation so results are independent of partitioning and
accumulation order, then surface a plain ``double``.

Why this matters at scale: a 1000-executor sum of doubles is
order-nondeterministic (floating addition is not associative), which breaks
both result reproducibility and oracle comparison. Decimal partial aggregates
are exact and associative — same answer at any parallelism — and the final
decimal→double conversion is a single deterministic IEEE rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Two fractional digits covers the fixtures' money-like columns
# (prices/discounts/taxes/values are generated with 2-decimal precision).
DEFAULT_SCALE = 2
DEFAULT_PRECISION = 18


def dec(col: Column | str, precision: int = DEFAULT_PRECISION, scale: int = DEFAULT_SCALE) -> Column:
    """Cast a (double) column to an exact decimal for order-stable math."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dec_sum(col: Column | str, precision: int = DEFAULT_PRECISION, scale: int = DEFAULT_SCALE) -> Column:
    """Exact decimal sum (associative partial aggregates; shuffle-safe)."""
    return F.sum(dec(col, precision, scale))


def exact_sum(col: Column | str, precision: int = DEFAULT_PRECISION, scale: int = DEFAULT_SCALE) -> Column:
    """Order-independent sum of a double column, surfaced as double."""
    return dec_sum(col, precision, scale).cast("double")


def exact_avg(col: Column | str, precision: int = DEFAULT_PRECISION, scale: int = DEFAULT_SCALE) -> Column:
    """Order-independent mean: exact decimal sum / count, divided as double."""
    c = F.col(col) if isinstance(col, str) else col
    return dec_sum(c, precision, scale).cast("double") / F.count(c)


def exact_div(num: Column, den: Column) -> Column:
    """Single double division — deterministic given deterministic operands."""
    return num.cast("double") / den.cast("double")
