"""Z-order layout (operators/zorder.py): quantified file-skipping win.

The contract is at the parquet-stats level: after write_zordered, a small
box predicate over BOTH columns intersects the min/max footer ranges of
far fewer files than either the natural layout (no locality: every file
spans everything) or a single-column sort (prunes its column only).
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from vmware_sd_wan_velocloud_bi_intake_spark.operators import zorder


def _files_intersecting(path, box):
    """Count parquet files whose per-file [min,max] intersects the box."""
    hit, total = 0, 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = {}, {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                st = col.statistics
                if st is None or name not in box:
                    continue
                mins[name] = min(mins.get(name, st.min), st.min)
                maxs[name] = max(maxs.get(name, st.max), st.max)
        total += 1
        if all(
            maxs.get(c, hi) >= lo and mins.get(c, lo) <= hi
            for c, (lo, hi) in box.items()
        ):
            hit += 1
    return hit, total


@pytest.fixture(scope="module")
def xy(spark):
    # 200k points, x/y decorrelated via independent hashes of the id
    df = (
        spark.range(200_000)
        .select(
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)).alias("x"),
            F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10_000)).alias("y"),
            F.col("id").alias("payload"),
        )
        .cache()
    )
    df.count()
    yield df
    df.unpersist()


def test_zorder_prunes_every_dimension(spark, xy, tmp_path):
    """The Z-order contract is BALANCE: a single-column sort is near-optimal
    for boxes on its own column but reads the whole table for the other;
    Z-order bounds both columns in every file, so single-column predicates
    on EITHER column prune, as does their conjunction."""
    n_files = 32
    zpath = str(tmp_path / "zordered")
    xpath = str(tmp_path / "xsorted")
    zorder.write_zordered(xy, zpath, ["x", "y"], n_files=n_files)
    (
        xy.repartitionByRange(n_files, F.col("x"))
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )
    # quadrant-aligned 10% bands (domain [0, 10000))
    box_x = {"x": (5000, 5999)}
    box_y = {"y": (5000, 5999)}
    box_xy = {"x": (5000, 5999), "y": (5000, 5999)}

    # the y-only band: x-sort cannot prune AT ALL; z-order fixes 2+ y-bits
    # per file → at most ~the files of two y-quadrants survive
    zy, _ = _files_intersecting(zpath, box_y)
    xy_hit, _ = _files_intersecting(xpath, box_y)
    assert xy_hit == n_files
    assert zy <= n_files // 2

    # the x-only band: both layouts prune (x-sort better — that is its one
    # dimension; z-order must still beat reading everything)
    zx, _ = _files_intersecting(zpath, box_x)
    xx, _ = _files_intersecting(xpath, box_x)
    assert xx <= n_files // 4
    assert zx <= n_files // 2

    # the conjunction: z-order intersects both dimensions' cuts
    zxy, _ = _files_intersecting(zpath, box_xy)
    assert zxy <= min(zx, zy)
    assert zxy <= n_files // 4

    # layout must not change the data: box query agrees across layouts
    expected = xy.where(
        F.col("x").between(*box_xy["x"]) & F.col("y").between(*box_xy["y"])
    ).count()
    for p in (zpath, xpath):
        got = (
            spark.read.parquet(p)
            .where(
                F.col("x").between(*box_xy["x"])
                & F.col("y").between(*box_xy["y"])
            )
            .count()
        )
        assert got == expected


def test_zvalue_is_pure_expression(spark, xy):
    dz, stats = zorder.zvalue_column(xy, ["x", "y"], bits=8)
    plan = dz._jdf.queryExecution().executedPlan().toString()
    assert "pythonUDF" not in plan.lower()
    assert stats["x"][0] is not None
    # morton key of the max corner uses all 16 bits
    top = dz.agg(F.max("zvalue")).head()[0]
    assert 0 < top < (1 << 16)


def test_zvalue_interleaving_locality(spark):
    """Neighbors in value space get nearby z-values: the max corner maps to
    the max key, the min corner to 0, and a quadrant stays in its Z range
    (the defining Morton property: the top bit pair selects the quadrant).
    """
    rows = [(0, 0), (1023, 1023), (0, 1023), (1023, 0), (512, 512)]
    df = spark.createDataFrame(rows, "x long, y long")
    dz, _ = zorder.zvalue_column(df, ["x", "y"], bits=10)
    vals = {
        (r["x"], r["y"]): r["zvalue"]
        for r in dz.collect()
    }
    assert vals[(0, 0)] == 0
    assert vals[(1023, 1023)] == (1 << 20) - 1
    # quadrant code = 2*bit(x) + bit(y) at the MSB pair (x interleaved
    # ahead of y): (x hi, y lo) -> quadrant 2, (x lo, y hi) -> quadrant 1
    assert vals[(1023, 0)] >> 18 == 2
    assert vals[(0, 1023)] >> 18 == 1
    assert vals[(512, 512)] >> 18 == 3


def test_zvalue_rejects_non_quantizable_column(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "x long, s string")
    with pytest.raises(ValueError, match="non-numeric"):
        zorder.zvalue_column(df, ["x", "s"], bits=8)


def test_zvalue_temporal_columns_cluster(spark):
    """date/timestamp quantize on their linear epoch forms — distinct
    values must land in distinct buckets, not all collapse to 0."""
    import datetime as dt

    rows = [
        (dt.date(2024, 1, 1 + i), dt.datetime(2024, 1, 1, i), i)
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "d date, ts timestamp, x int")
    dz, stats = zorder.zvalue_column(df, ["d", "ts"], bits=8)
    zs = [r["zvalue"] for r in dz.collect()]
    assert len(set(zs)) == len(zs)
    assert stats["d"][0] is not None and stats["ts"][1] is not None
