from .columns import (
    norm_str,
    canonical_map,
    miles_to_km,
    is_night_hour,
    date_key,
    time_key,
    hour_bucket,
    safe_ratio,
    sha256_key,
    ts_iso,
)

__all__ = [
    "norm_str",
    "canonical_map",
    "miles_to_km",
    "is_night_hour",
    "date_key",
    "time_key",
    "hour_bucket",
    "safe_ratio",
    "sha256_key",
    "ts_iso",
]
