"""Threshold banding / classification expressions (SURVEY.md §2.4 A16–A17).

- A16 count bucketing: business-policy count → range label (reference
  ``powerbi_main_fun.py:1374-1381``; the reference's '<50' else-bucket actually
  means '>50' — we keep the corrected label and document the quirk).
- A17 license banding: peak Mbps → SKU tier label (reference
  ``powerbi_main_fun.py:2075-2088``).

Both are pure ``when``-chains: constant-folded by Catalyst, codegen'd, no UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def band_by_thresholds(
    col: Column, thresholds: Sequence[float], labels: Sequence[str]
) -> Column:
    """Generic ascending-threshold bander.

    ``labels[i]`` applies when ``col <= thresholds[i]`` (first match wins);
    ``labels[-1]`` is the else-bucket. Requires ``len(labels) ==
    len(thresholds) + 1``.
    """
    if len(labels) != len(thresholds) + 1:
        raise ValueError("need len(labels) == len(thresholds) + 1")
    expr = F.when(col <= F.lit(thresholds[0]), F.lit(labels[0]))
    for t, lab in zip(thresholds[1:], labels[1:-1]):
        expr = expr.when(col <= F.lit(t), F.lit(lab))
    return expr.otherwise(F.lit(labels[-1]))


def count_band(col: Column) -> Column:
    """Reference A16 business-policy-count bands ('0-9','10-19','20-50','>50')."""
    return band_by_thresholds(col, [9, 19, 50], ["0-9", "10-19", "20-50", ">50"])


# Reference A17 tiers (powerbi_main_fun.py:2075-2088): peak Mbps → SKU model.
LICENSE_TIERS = [30.0, 50.0, 100.0, 200.0, 400.0, 1000.0]
LICENSE_LABELS = [
    "model_30M",
    "model_50M",
    "model_100M",
    "model_200M",
    "model_400M",
    "model_1G",
    "model_5G",
]


def license_band(peak_mbps: Column) -> Column:
    """Peak-Mbps → license SKU tier label."""
    return band_by_thresholds(peak_mbps, LICENSE_TIERS, LICENSE_LABELS)
