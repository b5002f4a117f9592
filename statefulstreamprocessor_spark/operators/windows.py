"""Event-time window aggregations: tumbling, sliding, session, latest-pair.

The reference core is windowless (its selling point, reference
README.md:265-268); its Flink comparator and Grafana dashboards define the
windowed workloads this module covers:

* tumbling/sliding — the dashboard aggregations
  (``07_InfluxDB_Grafana/*.json``) and the Flink comparator's
  ``SlidingEventTimeWindows(1s, 250ms)`` (``StreamJoiner.java:91``);
* session — required by the production target (north_rule);
* ``windowed_latest_pair`` — the Flink comparator's windowed
  latest-vs-latest join with the power derivation
  (``StreamJoiner.java:90-190``: per key+window, pair the most recent
  record of each side, ``result = (2π/60)·|speed·torque|`` clamped to
  20000, output time = the earlier of the two partners, 5-band level).

All are single-shuffle groupBy plans; the latest-pair uses ``max_by``
(partial-aggregated map-side, unlike the comparator's broken ``merge`` —
``StreamJoiner.java:184-189`` exits on merge).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "windowed_latest_pair",
    "power_level",
]

POWER_FACTOR = 2 * math.pi / 60  # reference ts_join_with_kafka_eos.py:88
POWER_CLAMP = 20000.0  # Flink comparator clamp, StreamJoiner.java:150


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Tumbling event-time window aggregation (dashboard-style rollup)."""
    keys = keys or []
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    out = df.groupBy(F.window(ts_col, duration).alias("__w"), *keys).agg(*aggs)
    return out.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *keys,
        *[F.col(c) for c in out.columns if c not in ["__w", *keys]],
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    size: str,
    slide: str,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Sliding event-time window aggregation (Flink comparator's shape)."""
    keys = keys or []
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    out = df.groupBy(F.window(ts_col, size, slide).alias("__w"), *keys).agg(*aggs)
    return out.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *keys,
        *[F.col(c) for c in out.columns if c not in ["__w", *keys]],
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Session windows with a fixed inactivity gap."""
    keys = keys or []
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    g = df.groupBy(F.session_window(ts_col, gap).alias("__w"), *keys)
    out = g.agg(*aggs)
    return out.select(
        F.col("__w.start").alias("session_start"),
        F.col("__w.end").alias("session_end"),
        *keys,
        *[F.col(c) for c in out.columns if c not in ["__w", *keys]],
    )


def power_level(result: Column) -> Column:
    """5-band power level, reference StreamJoiner.java:154-169:
    level = int(result / 20000.1 * 5), i.e. 4000.02-wide bands."""
    return F.floor(result / F.lit(20000.1) * 5).cast("int")


def windowed_latest_pair(
    df: DataFrame,
    keys: list[str] | str,
    ts_col: str,
    side_col: str,
    value_col: str,
    size: str,
    slide: str,
) -> DataFrame:
    """Flink-comparator parity: per (key, sliding window), pair the most
    recent record of each side and derive the power record.

    ``side_col`` must be 'r' (speed) / 's' (torque). Output one row per
    (window, key) where both sides are present:
    (window_start, window_end, key..., r_ts, r_value, s_ts, s_value,
    result, out_ts, level).
    """
    if isinstance(keys, str):
        keys = [keys]
    is_r = F.col(side_col) == "r"
    g = df.groupBy(F.window(ts_col, size, slide).alias("__w"), *keys)
    paired = g.agg(
        F.max_by(
            F.when(is_r, F.struct(F.col(ts_col).alias("t"), F.col(value_col).alias("v"))),
            F.when(is_r, F.col(ts_col)),
        ).alias("__r"),
        F.max_by(
            F.when(~is_r, F.struct(F.col(ts_col).alias("t"), F.col(value_col).alias("v"))),
            F.when(~is_r, F.col(ts_col)),
        ).alias("__s"),
    ).filter(F.col("__r").isNotNull() & F.col("__s").isNotNull())

    result = F.least(
        F.lit(POWER_CLAMP),
        F.abs(F.lit(POWER_FACTOR) * F.col("__r.v") * F.col("__s.v")),
    )
    return paired.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *keys,
        F.col("__r.t").alias("r_ts"),
        F.col("__r.v").alias("r_value"),
        F.col("__s.t").alias("s_ts"),
        F.col("__s.v").alias("s_value"),
        result.alias("result"),
        # output time = the earlier partner (StreamJoiner.java:138-143)
        F.least(F.col("__r.t"), F.col("__s.t")).alias("out_ts"),
        power_level(result).alias("level"),
    )
