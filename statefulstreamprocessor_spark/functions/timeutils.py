"""Timestamp normalization — vectorized column expressions.

Replicates the reference's recursive ÷1000 rule (``Record.extract_time``,
reference ``05_LocalStreamBuffer/local_stream_buffer.py:70-82``, duplicated
at ``06_DB_Connector/db_connector.py:13-18``): any numeric timestamp
≥ 1e11 is divided by 1000 until it is in seconds (handles ms, µs, ns).
Unrolled three times (ns → µs → ms → s) as a pure column expression so it
stays inside whole-stage codegen — byte-compatible with the reference for
every finite input the reference accepts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["normalize_epoch_seconds", "iso_format"]

_THRESHOLD = 1e11  # reference local_stream_buffer.py:79


def normalize_epoch_seconds(c: Column) -> Column:
    """Numeric epoch in s/ms/µs/ns → epoch seconds (double)."""
    out = c.cast("double")
    for _ in range(3):  # ns → µs → ms → s
        out = F.when(out >= F.lit(_THRESHOLD), out / F.lit(1000.0)).otherwise(out)
    return out


def iso_format(epoch_seconds: Column) -> Column:
    """Epoch seconds → ISO-8601 UTC string, byte-compatible with the
    reference's ``datetime.utcfromtimestamp().isoformat()``
    (db_connector.py:34-38): python's isoformat omits the fractional part
    entirely when it is zero."""
    ts = F.timestamp_seconds(epoch_seconds)
    whole = F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")
    frac = F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    micros_zero = F.unix_micros(ts) % F.lit(1_000_000) == 0
    return F.when(micros_zero, whole).otherwise(frac)
