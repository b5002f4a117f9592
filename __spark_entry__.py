"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query.

Column names and types are aligned between the Spark queries and the DuckDB
oracles (timestamps compared as epoch-microsecond BIGINTs, money-like sums
as DECIMAL) so the driver's order-insensitive value-hash comparison is
byte-stable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _event_sides(spark: SparkSession, sf_dir: str, left: str = "click",
                 right: str = "view"):
    ev = _load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value", "event_type"
    )
    r = ev.filter(F.col("event_type") == left).drop("event_type")
    s = ev.filter(F.col("event_type") == right).drop("event_type")
    return r, s


_NTZ_EPOCH = "1970-01-01 00:00:00"


def _us(c) -> F.Column:
    """TIMESTAMP_NTZ → epoch micros (bigint), independent of the session
    timezone (a plain cast to TIMESTAMP would shift with it)."""
    if isinstance(c, str):
        c = F.col(c)
    return F.timestamp_diff(
        "MICROSECOND", F.lit(_NTZ_EPOCH).cast("timestamp_ntz"), c
    )


# ---------------------------------------------------------------- queries

def q_nn_pair_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closure nearest-neighbor pairwise time-series join (SURVEY §2.3 J1)."""
    from statefulstreamprocessor_spark.operators import nn_join

    r, s = _event_sides(spark, sf_dir)
    out = nn_join(r, s, "user_id", "ts")
    return out.select(
        "user_id",
        _us("r_ts").alias("r_ts_us"),
        F.col("r_event_id"),
        F.col("r_value"),
        _us("s_ts").alias("s_ts_us"),
        F.col("s_event_id"),
        F.col("s_value"),
    )


def q_nn_pair_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 with the Δ-time band predicate (SURVEY §2.3 J2), Δ = 2 h."""
    from statefulstreamprocessor_spark.operators import nn_join

    r, s = _event_sides(spark, sf_dir)
    out = nn_join(r, s, "user_id", "ts", delta=7200.0)
    return out.select(
        "user_id",
        _us("r_ts").alias("r_ts_us"),
        F.col("r_event_id"),
        _us("s_ts").alias("s_ts_us"),
        F.col("s_event_id"),
    )


def q_asof_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase enriched with the latest earlier click."""
    from statefulstreamprocessor_spark.operators.asof import asof_join

    ev = _load(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(left, right, "user_id", "ts", direction="backward")
    return out.select(
        "user_id",
        _us("ts").alias("ts_us"),
        "event_id",
        "value",
        _us("right_ts").alias("click_ts_us"),
        F.col("right_event_id").alias("click_event_id"),
    )


def q_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1 h window aggregation per event_type (SURVEY §2.4 A4)."""
    from statefulstreamprocessor_spark.operators.windows import tumbling_agg

    ev = _load(spark, sf_dir, "events")
    out = tumbling_agg(
        ev, "ts", "1 hour", keys=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        ],
    )
    return out.select(
        _us("window_start").alias("ws_us"),
        "event_type", "n", "sum_value",
    )


def q_sliding_1h_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1 h / 15 min window counts (Flink comparator shape, J5/W4)."""
    from statefulstreamprocessor_spark.operators.windows import sliding_agg

    ev = _load(spark, sf_dir, "events")
    out = sliding_agg(
        ev, "ts", "1 hour", "15 minutes", keys=["event_type"],
        aggs=[F.count(F.lit(1)).alias("n")],
    )
    return out.select(
        _us("window_start").alias("ws_us"),
        "event_type", "n",
    )


def q_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows, 30 min gap, per user (north_rule W4)."""
    from statefulstreamprocessor_spark.operators.windows import session_agg

    ev = _load(spark, sf_dir, "events")
    out = session_agg(
        ev, "ts", "30 minutes", keys=["user_id"],
        aggs=[F.count(F.lit(1)).alias("n")],
    )
    return out.select(
        "user_id",
        _us("session_start").alias("ss_us"),
        _us("session_end").alias("se_us"),
        "n",
    )


def q_normalize_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference ÷1000 timestamp-normalization rule (SURVEY §2.2 P11) applied
    to s/ms/µs epoch variants of the events timestamps."""
    from statefulstreamprocessor_spark.functions import normalize_epoch_seconds

    ev = _load(spark, sf_dir, "events")
    base_us = _us("ts")
    return ev.select(
        "event_id",
        F.round(normalize_epoch_seconds(F.floor(base_us / 1_000_000)), 6).alias("from_s"),
        F.round(normalize_epoch_seconds(F.floor(base_us / 1_000)), 6).alias("from_ms"),
        F.round(normalize_epoch_seconds(base_us), 6).alias("from_us"),
    )


def q_unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→narrow unpivot (SURVEY §2.2 P4) over lineitem measures."""
    from statefulstreamprocessor_spark.functions import unpivot_wide

    li = _load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    )
    return unpivot_wide(
        li, ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )


def q_series_key_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series-key construction + side routing (SURVEY §2.2 P2/P6)."""
    from statefulstreamprocessor_spark.functions import make_series_key, route_side

    ev = _load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        make_series_key(F.col("user_id").cast("string"), F.col("event_type")).alias("series_key"),
        route_side(F.col("event_type"), "click", "view").alias("side"),
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact text dedup: keep min doc_id per identical text (training-data op)."""
    docs = _load(spark, sf_dir, "documents")
    return (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("dupes"))
        .select("keep_doc_id", "dupes")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: closure pairwise time-series join on sf0.001."""
    return q_nn_pair_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "nn_pair_join": q_nn_pair_join,
        "nn_pair_join_delta": q_nn_pair_join_delta,
        "asof_backward": q_asof_backward,
        "tumbling_hourly": q_tumbling_hourly,
        "sliding_1h_15m": q_sliding_1h_15m,
        "session_30m": q_session_30m,
        "normalize_ts": q_normalize_ts,
        "unpivot_lineitem": q_unpivot_lineitem,
        "series_key_route": q_series_key_route,
        "dedup_exact": q_dedup_exact,
    }


_NN_ORACLE = """
WITH merged AS (
    SELECT user_id, ts, 0 AS side, event_id, value FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT user_id, ts, 1 AS side, event_id, value FROM events WHERE event_type = 'view'
), ann AS (
    SELECT user_id, ts, side, event_id, value,
        last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER w_b AS prev_r_ts,
        last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS) OVER w_b AS prev_r_id,
        last_value(CASE WHEN side = 0 THEN value END IGNORE NULLS) OVER w_b AS prev_r_val,
        last_value(CASE WHEN side = 1 THEN ts END IGNORE NULLS) OVER w_b AS prev_s_ts,
        last_value(CASE WHEN side = 1 THEN event_id END IGNORE NULLS) OVER w_b AS prev_s_id,
        last_value(CASE WHEN side = 1 THEN value END IGNORE NULLS) OVER w_b AS prev_s_val,
        last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER w_a AS next_r_ts,
        last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS) OVER w_a AS next_r_id,
        last_value(CASE WHEN side = 0 THEN value END IGNORE NULLS) OVER w_a AS next_r_val,
        last_value(CASE WHEN side = 1 THEN ts END IGNORE NULLS) OVER w_a AS next_s_ts,
        last_value(CASE WHEN side = 1 THEN event_id END IGNORE NULLS) OVER w_a AS next_s_id,
        last_value(CASE WHEN side = 1 THEN value END IGNORE NULLS) OVER w_a AS next_s_val,
        lag(side) OVER (PARTITION BY user_id ORDER BY ts, side) AS prev_any_side
    FROM merged
    WINDOW
      w_b AS (PARTITION BY user_id ORDER BY ts ASC, side ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      w_a AS (PARTITION BY user_id ORDER BY ts DESC, side DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), pairs AS (
    -- alpha: (self, earliest other-side at-or-after)
    SELECT user_id,
        CASE WHEN side = 0 THEN ts ELSE next_r_ts END AS r_ts,
        CASE WHEN side = 0 THEN event_id ELSE next_r_id END AS r_event_id,
        CASE WHEN side = 0 THEN value ELSE next_r_val END AS r_value,
        CASE WHEN side = 0 THEN next_s_ts ELSE ts END AS s_ts,
        CASE WHEN side = 0 THEN next_s_id ELSE event_id END AS s_event_id,
        CASE WHEN side = 0 THEN next_s_val ELSE value END AS s_value
    FROM ann
    WHERE (CASE WHEN side = 0 THEN next_s_ts ELSE next_r_ts END) IS NOT NULL
    UNION ALL
    -- beta: (latest other-side at-or-before, self), forward-confirmed,
    -- skipped when adjacent to its other-side predecessor (alpha dup)
    SELECT user_id,
        CASE WHEN side = 0 THEN ts ELSE prev_r_ts END AS r_ts,
        CASE WHEN side = 0 THEN event_id ELSE prev_r_id END AS r_event_id,
        CASE WHEN side = 0 THEN value ELSE prev_r_val END AS r_value,
        CASE WHEN side = 0 THEN prev_s_ts ELSE ts END AS s_ts,
        CASE WHEN side = 0 THEN prev_s_id ELSE event_id END AS s_event_id,
        CASE WHEN side = 0 THEN prev_s_val ELSE value END AS s_value
    FROM ann
    WHERE (CASE WHEN side = 0 THEN prev_s_ts ELSE prev_r_ts END) IS NOT NULL
      AND (CASE WHEN side = 0 THEN next_s_ts ELSE next_r_ts END) IS NOT NULL
      AND prev_any_side = side
)
SELECT user_id, epoch_us(r_ts) AS r_ts_us, r_event_id, r_value,
       epoch_us(s_ts) AS s_ts_us, s_event_id, s_value
FROM pairs
{extra_where}
"""


def oracle_sql() -> dict[str, str]:
    return {
        "nn_pair_join": _NN_ORACLE.format(extra_where=""),
        "nn_pair_join_delta": (
            "SELECT user_id, r_ts_us, r_event_id, s_ts_us, s_event_id FROM ("
            + _NN_ORACLE.format(extra_where="")
            + ") WHERE abs(r_ts_us - s_ts_us) <= 7200::BIGINT * 1000000"
        ),
        "asof_backward": """
            WITH merged AS (
                SELECT user_id, ts, 0 AS side, event_id, NULL::BIGINT AS l_event_id,
                       NULL::DOUBLE AS l_value FROM events WHERE event_type = 'click'
                UNION ALL
                SELECT user_id, ts, 1 AS side, NULL::BIGINT, event_id, value
                FROM events WHERE event_type = 'purchase'
            ), ann AS (
                SELECT user_id, ts, side, event_id, l_event_id, l_value,
                    last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER w AS c_ts,
                    last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS) OVER w AS c_id
                FROM merged
                WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, side ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            )
            SELECT user_id, epoch_us(ts) AS ts_us, l_event_id AS event_id,
                   l_value AS value, epoch_us(c_ts) AS click_ts_us,
                   c_id AS click_event_id
            FROM ann WHERE side = 1
        """,
        "tumbling_hourly": """
            SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS ws_us, event_type,
                   count(*) AS n, sum(CAST(value AS DECIMAL(18,2))) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "sliding_1h_15m": """
            SELECT epoch_us(time_bucket(INTERVAL 15 MINUTES, ts)
                            - k.k * INTERVAL 15 MINUTES) AS ws_us,
                   event_type, count(*) AS n
            FROM events CROSS JOIN (SELECT unnest(range(4)) AS k) k
            GROUP BY 1, 2
        """,
        "session_30m": """
            WITH marked AS (
                SELECT user_id, ts,
                    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                              > INTERVAL 30 MINUTES
                         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                         THEN 1 ELSE 0 END AS new_session
                FROM events
            ), sess AS (
                SELECT user_id, ts,
                    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                FROM marked
            )
            SELECT user_id, epoch_us(min(ts)) AS ss_us,
                   epoch_us(max(ts) + INTERVAL 30 MINUTES) AS se_us,
                   count(*) AS n
            FROM sess GROUP BY user_id, sid
        """,
        "normalize_ts": """
            WITH base AS (
                SELECT event_id, epoch_us(ts) AS us FROM events
            ), v AS (
                SELECT event_id,
                       CAST(us // 1000000 AS DOUBLE) AS s0,
                       CAST(us // 1000 AS DOUBLE) AS ms0,
                       CAST(us AS DOUBLE) AS us0
                FROM base
            ), norm AS (
                SELECT event_id,
                    CASE WHEN s0 >= 1e11 THEN s0/1000 ELSE s0 END AS s1,
                    CASE WHEN ms0 >= 1e11 THEN ms0/1000 ELSE ms0 END AS ms1,
                    CASE WHEN us0 >= 1e11 THEN us0/1000 ELSE us0 END AS us1
                FROM v
            ), norm2 AS (
                SELECT event_id,
                    CASE WHEN s1 >= 1e11 THEN s1/1000 ELSE s1 END AS s2,
                    CASE WHEN ms1 >= 1e11 THEN ms1/1000 ELSE ms1 END AS ms2,
                    CASE WHEN us1 >= 1e11 THEN us1/1000 ELSE us1 END AS us2
                FROM norm
            )
            SELECT event_id,
                round(CASE WHEN s2 >= 1e11 THEN s2/1000 ELSE s2 END, 6) AS from_s,
                round(CASE WHEN ms2 >= 1e11 THEN ms2/1000 ELSE ms2 END, 6) AS from_ms,
                round(CASE WHEN us2 >= 1e11 THEN us2/1000 ELSE us2 END, 6) AS from_us
            FROM norm2
        """,
        "unpivot_lineitem": """
            SELECT l_orderkey, l_linenumber, 'l_quantity' AS quantity,
                   l_quantity AS result FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
        """,
        "series_key_route": """
            SELECT event_id,
                   CAST(user_id AS VARCHAR) || '.' || event_type AS series_key,
                   CASE WHEN event_type = 'click' THEN 'r'
                        WHEN event_type = 'view' THEN 's' END AS side
            FROM events
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS keep_doc_id, count(*) AS dupes
            FROM documents GROUP BY text
        """,
    }
