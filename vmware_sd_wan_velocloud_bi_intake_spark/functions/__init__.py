from .exact import dec, dec_sum, exact_avg, exact_div, exact_sum
from .sanitize import (
    clamp_pct,
    sanitize_text,
    valid_name,
    valid_postal_code,
)
from .temporal import (
    day_key,
    days_between,
    epoch_ms_to_ts,
    month_key,
    ts_to_epoch_ms,
    within_minutes,
)
from .banding import band_by_thresholds, count_band, license_band

__all__ = [
    "dec",
    "dec_sum",
    "exact_avg",
    "exact_div",
    "exact_sum",
    "clamp_pct",
    "sanitize_text",
    "valid_name",
    "valid_postal_code",
    "day_key",
    "month_key",
    "days_between",
    "epoch_ms_to_ts",
    "ts_to_epoch_ms",
    "within_minutes",
    "band_by_thresholds",
    "count_band",
    "license_band",
]
