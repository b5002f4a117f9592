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
                 partition_by: list[str], version: int = 0,
                 data_name: str = "data", prev_data_name: str | None = None):
        self.spark = spark
        self.path = path
        self.schema_ddl = schema_ddl
        self.partition_by = partition_by
        self._version = version
        self._data_name = data_name
        self._prev_data_name = prev_data_name

    @property
    def data_dir(self) -> str:
        return os.path.join(self.path, self._data_name)

    # ------------------------------------------------------------- commit
    def _commit_swap(self, staged_data: str) -> None:
        """Atomically replace the table's data with ``staged_data``.

        Iceberg-style versioned commit: the new file set moves to a fresh
        ``data-<version>`` directory, then ONE ``os.replace`` of the
        metadata file makes it current. A crash at any point leaves the
        metadata referencing a complete directory (old or new, never a
        mix, never missing). The immediately-superseded version dir is
        RETAINED so a reader that resolved the old metadata and is
        mid-scan keeps its snapshot (real old-or-new isolation, not just
        for readers opened after the commit); only versions older than
        the previous one — plus crashed staging leftovers — are swept
        here. :meth:`vacuum` reclaims the rest once no reader needs it.
        Single-maintainer semantics (like Iceberg's maintenance actions,
        which take a table lock).
        """
        new_version = self._version + 1
        new_name = f"data-{new_version:05d}"
        prev_name = self._data_name
        os.replace(staged_data, os.path.join(self.path, new_name))
        meta = {
            "schema": self.schema_ddl,
            "partition_by": self.partition_by,
            "version": new_version,
            "data_dir": new_name,
            "previous_data_dir": prev_name,
        }
        fd, tmp = tempfile.mkstemp(dir=self.path)
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self.path, _META))  # atomic commit point
        self._version, self._data_name = new_version, new_name
        self._prev_data_name = prev_name
        self._sweep(keep={new_name, prev_name})

    def _sweep(self, keep: set[str]) -> None:
        """Best-effort removal of version dirs / staging leftovers not in
        ``keep``."""
        for entry in os.listdir(self.path):
            full = os.path.join(self.path, entry)
            if entry in keep or not os.path.isdir(full):
                continue
            if entry == "data" or entry.startswith(("data-", "rewrite_", "compact_")):
                shutil.rmtree(full, ignore_errors=True)

    def vacuum(self) -> None:
        """Expire all superseded snapshots (Iceberg ``expire_snapshots``):
        deletes every version dir except the current one. Call when no
        reader still holds an older snapshot. The metadata's
        ``previous_data_dir`` pointer is cleared atomically too — a
        reloaded handle must see "vacuumed", not a dangling path that
        reads as on-disk corruption."""
        self._sweep(keep={self._data_name})
        self._prev_data_name = None
        meta = {
            "schema": self.schema_ddl,
            "partition_by": self.partition_by,
            "version": self._version,
            "data_dir": self._data_name,
            "previous_data_dir": None,
        }
        fd, tmp = tempfile.mkstemp(dir=self.path)
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self.path, _META))

    def changelog(self) -> DataFrame:
        """Row-level change feed vs the previous retained snapshot
        (Iceberg changelog-scan analogue, enabled by the snapshot
        retention in :meth:`_commit_swap`).

        Output: the table columns plus ``_change`` — the net multiset
        delta per distinct row (positive = inserted since the previous
        snapshot, negative = deleted); unchanged rows are absent, so a
        pure bin-pack compaction yields an EMPTY changelog. Shape: the
        two snapshots union with ±1 weights into ONE map-side-combinable
        aggregation over the row — no join, one exchange, partials
        collapse in the scan tasks.
        """
        if not self._prev_data_name:
            raise ValueError(
                "no previous snapshot retained (nothing committed yet, "
                "or it was vacuumed)"
            )
        prev_dir = os.path.join(self.path, self._prev_data_name)
        if not os.path.isdir(prev_dir):
            raise ValueError(f"previous snapshot missing: {prev_dir}")
        schema = self.spark.createDataFrame([], self.schema_ddl).schema
        cols = [f.name for f in schema.fields]
        cur = self.spark.read.schema(schema).parquet(self.data_dir).select(
            *cols, F.lit(1).alias("__w")
        )
        prev = self.spark.read.schema(schema).parquet(prev_dir).select(
            *cols, F.lit(-1).alias("__w")
        )
        return (
            cur.unionByName(prev)
            .groupBy(*cols)
            .agg(F.sum("__w").alias("_change"))
            .filter(F.col("_change") != 0)
        )

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

    def read_previous(self) -> DataFrame:
        """Time travel to the retained previous snapshot (Iceberg
        ``VERSION AS OF`` with this layer's two-snapshot retention):
        the exact file set the table showed before the last maintenance
        commit. Raises if nothing is retained (fresh table or vacuumed).
        Reads with the CURRENT declared schema — columns added since
        that snapshot come back NULL, the same read-time fill
        :meth:`add_column` relies on."""
        if not self._prev_data_name:
            raise ValueError(
                "no previous snapshot retained (nothing committed yet, "
                "or it was vacuumed)"
            )
        prev_dir = os.path.join(self.path, self._prev_data_name)
        if not os.path.isdir(prev_dir):
            raise ValueError(f"previous snapshot missing: {prev_dir}")
        return self.spark.read.schema(
            self.spark.createDataFrame([], self.schema_ddl).schema
        ).parquet(prev_dir)

    # ------------------------------------------------------ schema change
    def add_column(self, name: str, dtype: str) -> None:
        """Iceberg-style additive schema evolution: a METADATA-ONLY
        commit — no data file is rewritten. Existing files simply lack
        the column and every read fills it with NULL (the declared
        read schema drives the parquet scan, Iceberg's id-based
        projection semantics for an added field); subsequent appends
        must carry it. The metadata replace is the same single atomic
        commit point every other action uses."""
        declared = self.spark.createDataFrame([], self.schema_ddl).schema
        if name in [f.name for f in declared.fields]:
            raise ValueError(f"column {name!r} already exists")
        new_ddl = f"{self.schema_ddl}, {name} {dtype}"
        # validate the DDL before committing it
        self.spark.createDataFrame([], new_ddl)
        meta = {
            "schema": new_ddl,
            "partition_by": self.partition_by,
            "version": self._version,
            "data_dir": self._data_name,
            "previous_data_dir": self._prev_data_name,
        }
        fd, tmp = tempfile.mkstemp(dir=self.path)
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self.path, _META))
        self.schema_ddl = new_ddl

    def data_files(self) -> list[str]:
        out = []
        for root, _dirs, files in os.walk(self.data_dir):
            out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
        return sorted(out)

    # -------------------------------------------------------- maintenance
    def rewrite_data_files(self, target_files_per_partition: int = 1) -> int:
        """Bin-pack small files (Iceberg ``rewrite_data_files`` action).

        Rewrites every partition to AT MOST ``target_files_per_partition``
        files (a deterministic row-content salt spreads each partition's
        rows over up to that many write tasks; hash collisions can merge
        some, never split) and commits via :meth:`_commit_swap` — readers
        see either the old or the new file set, never a mix or a missing
        directory. Returns the new data-file count.
        """
        df = self.read()
        staged = tempfile.mkdtemp(prefix="rewrite_", dir=self.path)
        if self.partition_by:
            # partition cols alone would hash each partition VALUE to one
            # task → exactly 1 file regardless of the target (ADVICE
            # round-2); a deterministic row-content salt fans each
            # partition out to ≤ target tasks. The shuffle-partition count
            # is explicit (AQE would coalesce an un-numbered repartition
            # on small inputs and merge the salts back together) and
            # over-provisioned 8× so (dir, salt) hash collisions — which
            # merge files, never split — stay rare.
            salt = F.pmod(
                F.xxhash64(F.struct(*[F.col(c) for c in df.columns])),
                F.lit(target_files_per_partition),
            )
            n_dirs = df.select(*self.partition_by).distinct().count()
            num = max(
                int(n_dirs) * target_files_per_partition * 8,
                self.spark.sparkContext.defaultParallelism,
            )
            w = (
                df.repartition(num, *[F.col(c) for c in self.partition_by], salt)
                .write.mode("overwrite").partitionBy(*self.partition_by)
            )
        else:
            w = df.coalesce(target_files_per_partition).write.mode("overwrite")
        w.parquet(os.path.join(staged, "data"))
        self._commit_swap(os.path.join(staged, "data"))
        return len(self.data_files())

    def merge_into(
        self,
        source: DataFrame,
        keys: list[str],
        when_matched: str = "update",
    ) -> None:
        """Iceberg ``MERGE INTO`` analogue: upsert (or delete) by key,
        committed atomically via :meth:`_commit_swap`.

        ``when_matched="update"``: target rows whose key appears in
        ``source`` are REPLACED by the source row, unmatched source rows
        are INSERTED (the classic upsert). ``when_matched="delete"``:
        matched target rows are removed and nothing is inserted.
        Multiple source rows for one key raise (the same
        cardinality-violation error Iceberg's MERGE throws — silently
        picking one would be nondeterministic).

        Scale shape: the target anti-joins the source's DISTINCT keys —
        a hash (or, under the broadcast threshold/AQE, broadcast) join
        on the merge key, the only shuffle the corpus sees; the union
        with the source is shuffle-free. The rewrite stages a full new
        snapshot like every other maintenance action here (parquet is
        immutable; real Iceberg would rewrite only the touched files —
        same commit contract, coarser granularity), so :meth:`changelog`
        shows exactly the merged delta afterwards.
        """
        if when_matched not in ("update", "delete"):
            raise ValueError(
                f"when_matched must be update|delete, got {when_matched!r}"
            )
        declared = self.spark.createDataFrame([], self.schema_ddl).schema
        if when_matched == "update":
            got = {f.name: f.dataType for f in source.schema.fields}
            want = {f.name: f.dataType for f in declared.fields}
            if got != want:
                raise ValueError(
                    f"schema mismatch: table declares {want}, merge source "
                    f"got {got}"
                )
        if when_matched == "update":
            # Iceberg's MERGE cardinality error: two source rows updating
            # one key would be a nondeterministic pick. Delete-by-key is
            # insensitive to source duplicates, so only update checks.
            dup = (
                source.groupBy(*keys)
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
                .limit(1)
                .collect()
            )
            if dup:
                raise ValueError(
                    f"merge source has multiple rows for key "
                    f"{tuple(dup[0][k] for k in keys)!r} — MERGE requires "
                    "at most one source row per target key"
                )
        src_keys = source.select(*keys).distinct()
        survivors = self.read().join(src_keys, keys, "left_anti")
        merged = (
            survivors.unionByName(source.select(*[f.name for f in declared]))
            if when_matched == "update"
            else survivors
        )
        staged = tempfile.mkdtemp(prefix="compact_", dir=self.path)
        wr = merged.write.mode("overwrite")
        if self.partition_by:
            wr = wr.partitionBy(*self.partition_by)
        wr.parquet(os.path.join(staged, "data"))
        self._commit_swap(os.path.join(staged, "data"))

    def compact_latest_by_key(self, keys: list[str], order_col: str) -> None:
        """Kafka log-compaction analogue: keep the max-``order_col`` row per
        key, committed atomically via :meth:`_commit_swap`."""
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
        self._commit_swap(os.path.join(staged, "data"))


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
    os.makedirs(os.path.join(path, "data-00000"), exist_ok=True)
    with open(meta_path, "w") as f:
        json.dump(
            {
                "schema": schema_ddl,
                "partition_by": partition_by or [],
                "version": 0,
                "data_dir": "data-00000",
            },
            f,
        )
    return TableHandle(
        spark, path, schema_ddl, partition_by or [], 0, "data-00000"
    )


def load_table(spark: SparkSession, path: str) -> TableHandle:
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    # pre-versioning tables (no version/data_dir keys) keep reading "data"
    return TableHandle(
        spark, path, meta["schema"], meta["partition_by"],
        meta.get("version", 0), meta.get("data_dir", "data"),
        meta.get("previous_data_dir"),
    )
