"""NDJSON event-log sources and record codecs.

The reference's file path (S1/P4/P5): newline-delimited JSON of *wide*
multi-quantity objects ``{"Thing", "Timestamp", "<quantity>": value...,
"id"}`` (reference ``05_LocalStreamBuffer/test_events.json``; readers at
``01_Simulator/simulator.py:20-24``, ``simulatorToKafka.py:36-41``),
unpivoted into narrow records ``(thing, quantity, phenomenonTime, result)``
keyed ``thing.quantity`` (``simulatorToKafka.py:51-66``,
``03_Stream_Connector/stream_connector.py:38-57``).

Spark-first: ``spark.read.json`` / ``readStream`` with an explicit schema
(never schema inference in production), ``from_json``/``to_json`` for the
value codec, ``unpivot`` for wide→narrow, all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.records import make_series_key, unpivot_wide
from ..functions.timeutils import normalize_epoch_seconds

__all__ = [
    "read_wide_events",
    "wide_to_narrow_records",
    "narrow_records_json",
    "parse_narrow_json",
    "NARROW_RECORD_DDL",
]

# the narrow record every reference component exchanges
# (simulatorToKafka.py:59-62; PyFlink declares the same shape,
# 05_Flink_Python/Flink_Transformation_Example.py:46-50)
NARROW_RECORD_DDL = (
    "thing string, quantity string, phenomenonTime double, result double"
)


def read_wide_events(
    spark: SparkSession,
    path: str,
    quantity_cols: list[str],
    streaming: bool = False,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Read the wide NDJSON event log with an explicit schema.

    SKIP_FIRST_N / READ_FIRST_N (reference simulator.py:11-12) are plain
    ``offset``/``limit`` on the returned frame in batch mode.
    """
    ddl = (
        "Thing string, Timestamp long, id string, "
        + ", ".join(f"`{q}` double" for q in quantity_cols)
    )
    if streaming:
        return (
            spark.readStream.schema(ddl)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .json(path)
        )
    return spark.read.schema(ddl).json(path)


def wide_to_narrow_records(
    wide: DataFrame, quantity_cols: list[str]
) -> DataFrame:
    """Wide event rows → one narrow record per present quantity, with the
    reference's timestamp normalization (÷1000 rule) and series key."""
    narrow = unpivot_wide(
        wide.select("Thing", "Timestamp", *quantity_cols),
        ["Thing", "Timestamp"],
        quantity_cols,
        quantity_name="quantity",
        value_name="result",
    )
    return narrow.select(
        F.col("Thing").alias("thing"),
        F.col("quantity"),
        normalize_epoch_seconds(F.col("Timestamp")).alias("phenomenonTime"),
        F.col("result").cast("double").alias("result"),
        make_series_key(F.col("Thing"), F.col("quantity")).alias("series_key"),
    )


def narrow_records_json(narrow: DataFrame) -> DataFrame:
    """Encode narrow records as (key, value-json) — the Kafka wire shape
    (ts_join_with_kafka_eos.py:91-92)."""
    return narrow.select(
        F.col("series_key").alias("key"),
        F.to_json(
            F.struct("thing", "quantity", "phenomenonTime", "result")
        ).alias("value"),
    )


def parse_narrow_json(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Decode the narrow-record JSON value column (from_json, explicit
    schema — the engine-side of reference ts_join_with_kafka_eos.py:145)."""
    parsed = df.withColumn("__r", F.from_json(F.col(value_col), NARROW_RECORD_DDL))
    return parsed.select(
        *[c for c in df.columns if c != value_col],
        F.col("__r.thing").alias("thing"),
        F.col("__r.quantity").alias("quantity"),
        F.col("__r.phenomenonTime").alias("phenomenonTime"),
        F.col("__r.result").alias("result"),
    )
