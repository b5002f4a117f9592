"""End-to-end webtext streaming pipeline (the flagship production path).

Equivalent of the reference's full chain — simulator → Kafka →
LocalStreamBuffer EOS joiner → sink (reference README pipeline,
``ts_join_with_kafka_eos.py``) — re-expressed as one Structured Streaming
query over the webtext table:

  file/Iceberg stream of (url, warc_ts, html, side, …)
    → vectorized HTML→text extraction (Arrow pandas UDF; the target
      payload operator, never per-row Python)
    → withWatermark(warc_ts)
    → per-url streaming closure nearest-neighbor join (r-pass vs s-pass)
    → exactly-once idempotent epoch sink + lineage listener.

Scale notes: the join key is the url, so state and per-key work shard
across executors by hash; hot *domains* are naturally split because the
key is the full url (domain-level aggregations use two-phase salted aggs,
see ``operators.dedup``/docs). ``maxFilesPerTrigger`` (or Kafka
``maxOffsetsPerTrigger`` / Iceberg ``streaming-max-rows-per-micro-batch``)
is the reference's batched-consumption knob (test_kafka_eos_joiner.py:36).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textops import html_to_text_udf
from .sink import IdempotentBatchSink
from .stateful_join import streaming_nn_join

__all__ = ["read_webtext_stream", "build_webtext_join", "run_webtext_pipeline"]

WEBTEXT_DDL = (
    "url string, warc_ts timestamp_ntz, html binary, text string, "
    "lang string, side string, fetch_seq bigint"
)


def read_webtext_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    return (
        spark.readStream.schema(WEBTEXT_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def build_webtext_join(
    raw: DataFrame,
    watermark: str = "0 seconds",
    delta: float | None = None,
    use_extractor: bool = True,
    assume_in_order: bool = False,
) -> DataFrame:
    # watermarks require TIMESTAMP; parquet NTZ is cast once at the boundary
    # (sessions run UTC; on Iceberg the column is timestamptz already)
    from ..shipping import ensure_package_shipped

    ensure_package_shipped(raw.sparkSession)
    cols = [
        F.col("url"),
        F.col("warc_ts").cast("timestamp").alias("warc_ts"),
        F.col("side"),
        F.col("lang"),
    ]
    if use_extractor:
        cols.append(html_to_text_udf(F.col("html")).alias("text"))
    else:
        cols.append(F.col("text"))
    stream = raw.select(*cols).withWatermark("warc_ts", watermark)
    return streaming_nn_join(
        stream, keys=["url"], ts_col="warc_ts", side_col="side", delta=delta,
        assume_in_order=assume_in_order,
    )


def run_webtext_pipeline(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    watermark: str = "0 seconds",
    delta: float | None = None,
    max_files_per_trigger: int = 4,
    use_extractor: bool = True,
    assume_in_order: bool = False,
) -> IdempotentBatchSink:
    """Run the pipeline to completion (availableNow) with exactly-once sink.

    Re-running with the same out_dir resumes from the checkpoint: already
    committed epochs are skipped — the reference's round-2 ⇒ 0-new-rows
    contract (test_kafka_eos_joiner.py:285-286).
    """
    raw = read_webtext_stream(spark, input_dir, max_files_per_trigger)
    joined = build_webtext_join(
        raw, watermark, delta, use_extractor, assume_in_order=assume_in_order
    )
    sink = IdempotentBatchSink(out_dir)
    q = (
        joined.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(out_dir, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink
