from .timeutils import iso_format, normalize_epoch_seconds
from .records import make_series_key, route_side, unpivot_wide
from .mathops import midpoint_ts, power_result

__all__ = [
    "normalize_epoch_seconds",
    "iso_format",
    "unpivot_wide",
    "make_series_key",
    "route_side",
    "power_result",
    "midpoint_ts",
]
