"""Executable table administration: create / append / compact / maintain.

The Spark-native counterpart of the reference's topic administration —
``test_kafka_eos_joiner.py:119-139`` creates its input/output topics with
explicit ``partitions=5/3`` and ``cleanup.policy=compact`` before running
the pipeline. On a lakehouse the same responsibilities are Iceberg DDL
(``CREATE TABLE ... PARTITIONED BY (days(warc_ts), bucket(N, url))``) and
table maintenance (``rewrite_data_files`` for small-file compaction). This
module implements those operations against partitioned parquet (the
sandbox stand-in), with the same observable contracts:

* ``create_table`` — declare schema + partition spec, persisted in a
  metadata file so later writers/maintainers validate against it;
* ``TableHandle.append`` — partition-spec-respecting write;
* ``TableHandle.rewrite_data_files`` — bin-pack small files per partition
  (Iceberg's compaction action; commit is an atomic directory swap);
* ``TableHandle.compact_latest_by_key`` — log-compaction analogue of
  Kafka ``cleanup.policy=compact``: keep the latest row per key.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["create_table", "load_table", "TableHandle"]

_META = "_table_metadata.json"


class TableHandle:
    def __init__(self, spark: SparkSession, path: str, schema_ddl: str,
                 partition_by: list[str]):
        self.spark = spark
        self.path = path
        self.schema_ddl = schema_ddl
        self.partition_by = partition_by
        self.data_dir = os.path.join(path, "data")

    # ------------------------------------------------------------- write
    def append(self, df: DataFrame) -> None:
        """Append rows under the declared partition spec (schema-checked)."""
        declared = self.spark.createDataFrame([], self.schema_ddl).schema
        got = {f.name: f.dataType for f in df.schema.fields}
        want = {f.name: f.dataType for f in declared.fields}
        if got != want:
            raise ValueError(
                f"schema mismatch: table declares {want}, append got {got}"
            )
        w = df.write.mode("append")
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.parquet(self.data_dir)

    # -------------------------------------------------------------- read
    def read(self) -> DataFrame:
        return self.spark.read.schema(
            self.spark.createDataFrame([], self.schema_ddl).schema
        ).parquet(self.data_dir)

    def data_files(self) -> list[str]:
        out = []
        for root, _dirs, files in os.walk(self.data_dir):
            out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
        return sorted(out)

    # -------------------------------------------------------- maintenance
    def rewrite_data_files(self, target_files_per_partition: int = 1) -> int:
        """Bin-pack small files (Iceberg ``rewrite_data_files`` action).

        Rewrites every partition to ``target_files_per_partition`` files and
        commits with an atomic directory swap — readers see either the old
        or the new file set, never a mix. Returns the new data-file count.
        """
        df = self.read()
        staged = tempfile.mkdtemp(prefix="rewrite_", dir=self.path)
        w = df.coalesce(target_files_per_partition).write.mode("overwrite")
        if self.partition_by:
            # repartition by the spec so each partition lands in
            # target_files_per_partition files
            w = (
                df.repartition(target_files_per_partition,
                               *[F.col(c) for c in self.partition_by])
                .write.mode("overwrite").partitionBy(*self.partition_by)
            )
        w.parquet(os.path.join(staged, "data"))
        old = self.data_dir + ".old"
        os.replace(self.data_dir, old)
        os.replace(os.path.join(staged, "data"), self.data_dir)
        shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(staged, ignore_errors=True)
        return len(self.data_files())

    def compact_latest_by_key(self, keys: list[str], order_col: str) -> None:
        """Kafka log-compaction analogue: keep the max-``order_col`` row per
        key, committed atomically like ``rewrite_data_files``."""
        from pyspark.sql import Window

        df = self.read()
        w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
        latest = (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        staged = tempfile.mkdtemp(prefix="compact_", dir=self.path)
        wr = latest.write.mode("overwrite")
        if self.partition_by:
            wr = wr.partitionBy(*self.partition_by)
        wr.parquet(os.path.join(staged, "data"))
        old = self.data_dir + ".old"
        os.replace(self.data_dir, old)
        os.replace(os.path.join(staged, "data"), self.data_dir)
        shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(staged, ignore_errors=True)


def create_table(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    partition_by: list[str] | None = None,
) -> TableHandle:
    """Declare a partitioned table (errors if it already exists)."""
    meta_path = os.path.join(path, _META)
    if os.path.exists(meta_path):
        raise FileExistsError(f"table already exists at {path}")
    os.makedirs(os.path.join(path, "data"), exist_ok=True)
    with open(meta_path, "w") as f:
        json.dump(
            {"schema": schema_ddl, "partition_by": partition_by or []}, f
        )
    return TableHandle(spark, path, schema_ddl, partition_by or [])


def load_table(spark: SparkSession, path: str) -> TableHandle:
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    return TableHandle(spark, path, meta["schema"], meta["partition_by"])
