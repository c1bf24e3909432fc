"""Z-order (Morton) data layout for multi-column file skipping.

Parquet scans prune files (and row groups) whose min/max statistics
exclude the predicate — but sorting on one column destroys locality on
every other. Interleaving the bits of several columns' rank-normalized
values gives every participating column bounded per-file value ranges, so
selective predicates on ANY of them skip most files. This is the standard
lakehouse layout trick (Delta/Iceberg `OPTIMIZE ZORDER BY`), re-expressed
as plain Spark: one stats aggregation, a pure-expression Morton key, one
range repartition, a sorted write.

At 100 TB the win is at the SCAN: a 1%-selective predicate over a
Z-ordered table touches ~√(1%) of files per dimension pair instead of all
of them. Cost is one extra shuffle at WRITE time — the same trade as
`sinks/bucketed.py`, paid once where reads repeat.

All computation is bit arithmetic on longs (`shiftleft`/`|`) — no UDFs;
the quantization is min/max linear with NULLs mapped to bucket 0 (nulls
first, the parquet stats convention).
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantize(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Map a numeric column linearly onto [0, 2^bits) as a long."""
    span = (cmax - cmin).cast("double")
    unit = (col.cast("double") - cmin.cast("double")) / F.when(
        span > 0, span
    ).otherwise(F.lit(1.0))
    q = F.floor(unit * F.lit((1 << bits) - 1)).cast("long")
    return F.coalesce(
        F.greatest(F.least(q, F.lit((1 << bits) - 1)), F.lit(0)), F.lit(0)
    )


def _interleave(quantized: list[Column], bits: int) -> Column:
    """Morton-interleave k quantized values, MSB first (expression tree of
    k*bits shift/or terms — Catalyst constant-folds the shift amounts)."""
    k = len(quantized)
    terms = []
    for b in range(bits):  # b = 0 is the MSB of each input
        src = bits - 1 - b
        for i, q in enumerate(quantized):
            dst = (bits - 1 - b) * k + (k - 1 - i)
            bit = F.shiftright(q, src).bitwiseAND(F.lit(1).cast("long"))
            terms.append(F.shiftleft(bit, dst))
    return reduce(lambda a, c: a.bitwiseOR(c), terms).alias("zvalue")


def zvalue_column(
    df: DataFrame, cols: Sequence[str], bits: int = 12
) -> tuple[DataFrame, dict]:
    """Attach a ``zvalue`` column Morton-interleaving ``cols``.

    One global min/max aggregation sizes the quantization (the stats the
    writer needs anyway); returns (df+zvalue, stats) so callers can reuse
    or log the ranges. ``bits`` per column — k columns make a k*bits-bit
    key; keep k*bits ≤ 60 to stay in a signed long.
    """
    if len(cols) * bits > 60:
        raise ValueError("zvalue: k*bits must fit a signed long (<= 60)")
    # a non-orderable-as-number column (e.g. a string passed by mistake)
    # would silently quantize every row to bucket 0 — no clustering, no
    # error — because (cmax - cmin).cast('double') is NULL; fail loudly
    ok = ("tinyint", "smallint", "int", "bigint", "float", "double",
          "date", "timestamp", "timestamp_ntz")
    srcs: dict[str, Column] = {}
    for c in cols:
        dt = df.schema[c].dataType.simpleString()
        if dt not in ok and not dt.startswith("decimal"):
            raise ValueError(
                f"zvalue: column {c!r} has non-numeric/temporal type {dt}; "
                "Z-order needs a linearly quantizable domain"
            )
        # temporals have no (date) or an awkward interval (timestamp)
        # subtraction; stage the linear numeric form up front
        if dt == "date":
            srcs[c] = F.unix_date(F.col(c))
        elif dt.startswith("timestamp"):
            srcs[c] = F.col(c).cast("double")  # epoch seconds
        else:
            srcs[c] = F.col(c)
    row = df.agg(
        *[F.min(srcs[c]).alias(f"min_{c}") for c in cols],
        *[F.max(srcs[c]).alias(f"max_{c}") for c in cols],
    ).head()
    stats = {c: (row[f"min_{c}"], row[f"max_{c}"]) for c in cols}
    qs = [
        _quantize(
            srcs[c], F.lit(stats[c][0]), F.lit(stats[c][1]), bits
        )
        for c in cols
    ]
    return df.withColumn("zvalue", _interleave(qs, bits)), stats


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 32,
    bits: int = 12,
) -> dict:
    """Write ``df`` as ``n_files`` parquet files clustered by Z-value.

    ``repartitionByRange`` on the Morton key gives each output file a
    contiguous Z-range — i.e. a small hyper-rectangle of the value space —
    so per-file min/max stats become selective on EVERY ``cols`` member.
    Returns the quantization stats. The ``zvalue`` column is dropped from
    the output (it is layout, not data).
    """
    import math

    dz, stats = zvalue_column(df, cols, bits)
    # Cut files on the TOP z-bits, not on sampled range boundaries: a
    # sampled cut lands mid-quadrant, and a file straddling a quadrant
    # boundary unions two far-apart value rectangles — its min/max widen
    # to the parent quadrant and the skipping guarantee halves per
    # straddle. Bucket-aligned cuts keep every file inside one Morton cell
    # (range-partitioning the 2^b distinct bucket values is stable: each
    # output file receives whole buckets).
    bucket_bits = max(1, math.ceil(math.log2(n_files)))
    if bucket_bits > len(cols) * bits:
        # a negative shift is masked mod 64 by the JVM: every row would
        # silently land in bucket 0 and the layout collapse to one file
        raise ValueError(
            f"write_zordered: n_files={n_files} needs {bucket_bits} bucket "
            f"bits but the key has only {len(cols) * bits}; lower n_files "
            "or raise bits"
        )
    shift = len(cols) * bits - bucket_bits
    bucket = F.shiftright(F.col("zvalue"), shift)
    (
        dz.repartitionByRange(n_files, bucket)
        .sortWithinPartitions("zvalue")
        .drop("zvalue")
        .write.mode("overwrite")
        .parquet(path)
    )
    return stats
