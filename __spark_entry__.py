"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real implementation lives in ``vmware_sd_wan_velocloud_bi_intake_spark/``;
this module only adapts the catalog to the driver's calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_ROOT)
# Python workers unpickle UDF closures referencing the package; make it
# importable for worker processes spawned after this import.
os.environ["PYTHONPATH"] = os.pathsep.join(
    [_REPO_ROOT] + [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep) if p]
)

from vmware_sd_wan_velocloud_bi_intake_spark.queries import all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"
_PYFILES_SENT: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Distribute the package to executors of an externally-created session.

    Covers the case where the driver built the SparkSession before importing
    this module (workers then never saw our PYTHONPATH): a zip of the package
    goes out via addPyFile once per session.
    """
    key = id(spark)
    if key in _PYFILES_SENT:
        return
    try:
        import shutil
        import tempfile

        zip_base = os.path.join(
            tempfile.gettempdir(), "vmware_sd_wan_velocloud_bi_intake_spark_pkg"
        )
        zip_path = shutil.make_archive(
            zip_base,
            "zip",
            root_dir=_REPO_ROOT,
            base_dir="vmware_sd_wan_velocloud_bi_intake_spark",
        )
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # local-mode sessions created after import already inherit PYTHONPATH
    _PYFILES_SENT.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Uses the pricing-summary aggregation (A8 family) — the engine's
    minimum end-to-end slice per SURVEY.md §7 step 2.
    """
    _ship_package(spark)
    return all_queries()["a08_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship_package(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(q.fn) for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query."""
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
