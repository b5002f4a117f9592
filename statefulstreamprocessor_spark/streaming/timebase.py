"""Watermark basis alignment for custom stateful operators.

``applyInPandasWithState`` delivers event-time columns to pandas as
SESSION-LOCAL NAIVE datetimes (measured: a ``timestamp_ntz`` value cast
to ``timestamp`` under ``America/New_York`` arrives in pandas as the
original wall-clock value, dtype ``datetime64[ns]`` with no tz), while
``GroupState.getCurrentWatermarkMs()`` is TRUE EPOCH milliseconds.
Comparing the two directly is wrong by the session's UTC offset whenever
``spark.sql.session.timeZone`` is not UTC — under New York every custom
stateful operator silently dropped the rows arriving within 5 h of a
watermark advance (round-5 timezone cross-check: 5 gate queries off by
~1-2% of their rows).

The fix direction matters. Localizing every ROW naive→epoch is ambiguous
in the DST fall-back hour; converting the single WATERMARK epoch→local
is a total function (an instant has exactly one local rendering). So the
operators keep all row math in the delivered naive basis — which is also
the batch operators' basis: the NTZ → ``cast('timestamp')`` → delivered-
naive round trip is the identity — and convert only the watermark with
:func:`watermark_to_naive_us`. Timeout timestamps
(``setTimeoutTimestamp``) stay epoch — that API compares against the
real watermark clock.
"""

from __future__ import annotations

import datetime as _dt
from functools import lru_cache

__all__ = ["watermark_to_naive_us", "session_tz"]

_UTC_NAMES = frozenset({"UTC", "Etc/UTC", "GMT", "Etc/GMT", "Z", "+00:00"})


def session_tz(spark) -> str:
    """The session timezone name to close over at operator-build time
    (the value that governs how the running query renders timestamps
    into pandas)."""
    try:
        return spark.conf.get("spark.sql.session.timeZone") or "UTC"
    except Exception:
        return "UTC"


@lru_cache(maxsize=8)
def _zone(tz_name: str):
    from zoneinfo import ZoneInfo

    return ZoneInfo(tz_name)


def watermark_to_naive_us(wm_ms: int, tz_name: str) -> int:
    """Epoch watermark (ms) → the session-local NAIVE microsecond value
    comparable with delivered event times. Identity under UTC; the
    CONVERSION is exact for any fixed or DST offset (offset looked up AT
    the watermark instant, floor-second — offsets change only on whole
    minutes).

    Caveat (ADVICE round-5): the naive-basis COMPARISON is not injective
    during a DST fall-back transition — the repeated local hour renders
    two distinct instants to one naive value, so events whose local time
    falls inside that hour can classify late/sealed up to the DST shift
    off their epoch-basis answer. Streams that can straddle a fall-back
    transition should run under a UTC (or any fixed-offset) session
    timezone, where the mapping is a bijection and semantics are exact."""
    if wm_ms <= 0:
        return 0
    if tz_name in _UTC_NAMES:
        return wm_ms * 1000
    off = _dt.datetime.fromtimestamp(wm_ms // 1000, _zone(tz_name)).utcoffset()
    return wm_ms * 1000 + int(off.total_seconds()) * 1_000_000
