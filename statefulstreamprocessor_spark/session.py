"""SparkSession construction with scale-appropriate defaults.

Tuned for the engine's workload: shuffle-light window/stateful plans, Arrow
pandas UDFs, AQE with skew-join handling, RocksDB state store for streaming
state (per the production deployment target; falls back to the default HDFS
state store when RocksDB is unavailable in the local JVM).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark"]


def get_spark(
    app_name: str = "statefulstreamprocessor-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    rocksdb_state: bool = False,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) for the
    sandbox; on a real cluster pass ``None`` master via spark-submit instead.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus) if cpus.isdigit() else 32, 8)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime re-planning, partition coalescing, skew-join splitting
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for every pandas UDF / applyInPandas exchange
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # whole-stage-codegen class cache (SQLConf CODEGEN_CACHE_MAX_ENTRIES,
        # default 100): an application running many distinct plans — this
        # engine's query registry, or any multi-query ETL driver — evicts
        # and RE-COMPILES generated classes on every re-run past 100 cached
        # units (janino compile ~30-100 ms per WholeStageCodegen span;
        # measured 1.3 s across the 13-query bench sweep). 2000 entries is
        # ≤~100 MB of metaspace worst-case and scale-independent (the cache
        # is per-JVM and plan-shape-keyed, not data-sized).
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        # ObjectHashAggregateExec (collect_list/collect_set and other
        # TypedImperativeAggregates) falls back to SORT-based aggregation
        # after only 128 distinct keys per task by default — i.e. almost
        # always — paying an extra full sort of the partition. 64k keys
        # before fallback keeps the hash path for realistic group counts;
        # per-task memory stays bounded by the partition's own payload
        # (each input row is stored in exactly one group buffer, so the
        # map holds ≈ the partition's rows — the same bytes the sort path
        # buffers/spills), and the sort fallback still engages beyond 64k
        # groups. Plan-shape-keyed, independent of local core count;
        # measured on the ngram gram-exchange stage: 0.52 → 0.43 s.
        .config(
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
            "65536",
        )
        # keep parquet scans prunable
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if rocksdb_state:
        b = b.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    # make this package importable on executor python workers regardless of
    # the driver's cwd — the library equivalent of spark-submit --py-files
    from .shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    return spark
