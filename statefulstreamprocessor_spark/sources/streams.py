"""Streaming source builders: rate-limited replay and Kafka.

* ``rate_replay`` — the reference's rate-limited simulator (S2, reference
  ``01_Simulator/simulator.py:27-54``: emit ≤ SAMPLE_RATE msg/s looping
  over a file) as a ``rate-micro-batch`` source joined to the static table
  by row index: deterministic, backpressure-free pacing. Spark-first
  replacement for producer-side sleeps (``simulator.py:44-48``).
* ``kafka_source`` / ``kafka_sink_writer`` — the Kafka path (S5/S6/S8/S9):
  offset tracking belongs to the checkpoint (the reference's manual
  ``auto.commit=False`` bookkeeping, ``ts_join_with_kafka_eos.py:41-49``);
  ``maxOffsetsPerTrigger`` is the batched-consume knob
  (``test_kafka_eos_joiner.py:36``). No broker exists in this sandbox, so
  these builders are exercised only for plan construction; the exactly-once
  *sink* contract is covered by the idempotent epoch sink tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "rate_replay",
    "kafka_source",
    "kafka_sink_options",
    "kafka_like_stream",
    "deserialize_kafka_json",
    "KAFKA_WIRE_DDL",
    "mqtt_like_stream",
    "mqtt_qos2_exactly_once",
    "MQTT_WIRE_DDL",
]

# Kafka's exact wire schema (what spark-sql-kafka exposes) — the broker-free
# stand-in below produces it so consumer-side code is byte-compatible
KAFKA_WIRE_DDL = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp_ntz, timestampType int"
)


def rate_replay(
    spark: SparkSession,
    table: DataFrame,
    rows_per_second: int,
    loop: bool = False,
    index_col: str | None = None,
) -> DataFrame:
    """Replay a static table as a stream at a fixed rate.

    Joins the ``rate-micro-batch`` source (deterministic row numbering) to
    the table by row index; ``loop=True`` wraps around like the reference
    simulator's infinite loop (simulator.py:50-54). The join is a broadcast
    of nothing — the static side is shuffled once by index and reused.

    ``index_col``: a pre-existing contiguous 0..n-1 row index (e.g. the
    webtext table's ``fetch_seq``) — the scale path. Without it the index
    is derived with a global row_number over a single-partition sort,
    acceptable only for test-harness-sized replay tables.
    """
    n = table.count()
    from pyspark.sql import Window

    if index_col is not None:
        indexed = table.withColumn("__idx", F.col(index_col).cast("long"))
    else:
        indexed = table.withColumn(
            "__idx",
            F.row_number().over(Window.orderBy(F.monotonically_increasing_id()))
            - 1,
        ).localCheckpoint()  # materialize: stream-side plans reject the id expr
    rate = spark.readStream.format("rate-micro-batch").option(
        "rowsPerBatch", rows_per_second
    ).load()
    key = F.col("value") % n if loop else F.col("value")
    paced = rate.select(key.cast("long").alias("__idx"), F.col("timestamp").alias("__emit_ts"))
    if not loop:
        paced = paced.filter(F.col("__idx") < n)
    return paced.join(indexed, "__idx").drop("__idx")


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 100_000,
) -> DataFrame:
    """Kafka readStream with the engine's defaults (explicit offsets; the
    checkpoint, not the consumer group, owns progress)."""
    r = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger:
        r = r.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return r.load()


def kafka_like_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Broker-free Kafka contract stand-in: a file stream carrying Kafka's
    exact wire schema (key/value/topic/partition/offset/timestamp).

    Progress ownership is identical to the real source: the streaming
    checkpoint — not any consumer group — records what was consumed, so a
    killed query resumes without re-emitting offsets (the reference's
    manual ``auto.commit=False`` bookkeeping,
    ``ts_join_with_kafka_eos.py:41-49``, with the commit moved into the
    engine). Swap in :func:`kafka_source` on a real cluster; downstream
    code is unchanged.
    """
    return (
        spark.readStream.schema(KAFKA_WIRE_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


# MQTT PUBLISH wire fields (packet id + DUP flag are what the QoS 2
# handshake dedups on); the broker-free stand-in below produces them
MQTT_WIRE_DDL = (
    "packet_id bigint, topic string, payload string, qos int, "
    "dup boolean, publish_ts timestamp_ntz"
)


def mqtt_like_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Broker-free MQTT contract stand-in (S3, reference
    ``01_Simulator/simulator.py`` publishing with ``qos=2``): a file
    stream carrying the PUBLISH wire fields. Wire-level redeliveries —
    what QoS 2's PUBREC/PUBREL/PUBCOMP handshake exists to absorb when an
    ack is lost — appear as additional rows with the SAME ``packet_id``
    and ``dup=true``, exactly how a resumed MQTT session retransmits.
    Pair with :func:`mqtt_qos2_exactly_once` for the application-visible
    exactly-once contract."""
    return (
        spark.readStream.schema(MQTT_WIRE_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def mqtt_qos2_exactly_once(
    df: DataFrame,
    ts_col: str = "publish_ts",
    redelivery_window: str = "1 hour",
) -> DataFrame:
    """QoS 2 receiver semantics: each ``packet_id`` reaches the
    application EXACTLY ONCE no matter how often the wire redelivered it.

    A real broker holds the packet id in session state until PUBCOMP;
    here the state is Spark's watermarked dedup state —
    ``dropDuplicatesWithinWatermark`` on the packet id, evicted once the
    watermark passes ``redelivery_window`` (the broker's in-flight window
    analogue), so state is bounded exactly like the broker's. Combined
    with the checkpoint, the contract survives kill-and-resume: a
    redelivery straddling a consumer restart is still dropped (pytest
    drives that path)."""
    # watermarks require TIMESTAMP (not NTZ); the dedup key itself is
    # timezone-independent, so the cast only drives state eviction
    return (
        df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, redelivery_window)
        .dropDuplicatesWithinWatermark(["packet_id"])
    )


def deserialize_kafka_json(df: DataFrame, value_ddl: str) -> DataFrame:
    """Deserializer (S8, reference ``StreamingJobs/.../Deserializer``):
    JSON value → typed columns, with the per-record Kafka lineage
    (topic, partition, offset) carried alongside — the reference logs the
    same triple per consumed record (ts_join_with_kafka_eos.py:151-156)."""
    return df.select(
        "topic",
        "partition",
        "offset",
        F.col("timestamp").alias("kafka_ts"),
        F.from_json(F.col("value").cast("string"), value_ddl).alias("v"),
    ).select("topic", "partition", "offset", "kafka_ts", "v.*")


def kafka_sink_options(bootstrap_servers: str, topic: str) -> dict[str, str]:
    """writeStream options for the Kafka sink; exactly-once end-to-end is
    checkpoint + idempotent/transactional downstream (see streaming.sink
    for the lakehouse MERGE equivalent)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
    }
