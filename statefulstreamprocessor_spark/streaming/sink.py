"""Exactly-once idempotent batch sink (``foreachBatch``).

The Spark-native form of the reference's consume-transform-produce Kafka
transaction (reference ``ts_join_with_kafka_eos.py:96-104``: produce +
send_offsets_to_transaction + commit per epoch) and of its InfluxDB
tags+time-unique-key upsert (``db_connector.py:53-66``). The observable
contract is the reference's round-2 test: re-processing the same input
epoch produces zero new rows (``test_kafka_eos_joiner.py:285-286``).

Mechanism: each micro-batch writes its rows to an epoch-scoped directory
``data/batch=<batchId>`` with overwrite semantics, then durably records the
batchId in a ledger (atomic rename). A replayed epoch after a crash either
overwrites the same directory with identical deterministic content
(write-then-crash case) or is skipped outright (ledger-hit case) — both
yield exactly-once output. Readers see only ledger-committed epochs.

On a production lakehouse the same contract is one statement:
``MERGE INTO out USING batch ON out.url = batch.url AND out.warc_ts =
batch.warc_ts WHEN NOT MATCHED THEN INSERT *`` against an Iceberg table
(plus checkpointed source offsets); this sink is the dependency-free
sandbox implementation with identical semantics.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["IdempotentBatchSink", "FanoutSink", "UpsertTableSink"]


class IdempotentBatchSink:
    """foreachBatch writer with exactly-once epoch semantics + lineage.

    ``merge_keys`` adds upsert semantics on the read path (merge-on-read,
    like Iceberg MOR / the reference's InfluxDB tags+time primary key,
    db_connector.py:53-66): for duplicate keys across epochs the row from
    the latest committed epoch wins.
    """

    def __init__(self, path: str, merge_keys: list[str] | None = None):
        self.path = path
        self.merge_keys = merge_keys
        self.data_dir = os.path.join(path, "data")
        self.ledger_path = os.path.join(path, "ledger.json")
        self.lineage_path = os.path.join(path, "lineage.jsonl")
        os.makedirs(self.data_dir, exist_ok=True)

    # ------------------------------------------------------------- ledger
    def committed_batches(self) -> list[int]:
        if not os.path.exists(self.ledger_path):
            return []
        with open(self.ledger_path) as f:
            return json.load(f)["batches"]

    def _commit(self, batch_id: int) -> None:
        batches = self.committed_batches()
        batches.append(batch_id)
        fd, tmp = tempfile.mkstemp(dir=self.path)
        with os.fdopen(fd, "w") as f:
            json.dump({"batches": batches}, f)
        os.replace(tmp, self.ledger_path)  # atomic commit point

    def _lineage_ids(self) -> set[int]:
        if not os.path.exists(self.lineage_path):
            return set()
        with open(self.lineage_path) as f:
            return {json.loads(line)["batch_id"] for line in f if line.strip()}

    def _append_lineage(self, batch_id: int, n: int) -> None:
        with open(self.lineage_path, "a") as f:
            f.write(json.dumps({"batch_id": batch_id, "rows": n}) + "\n")

    # -------------------------------------------------------------- write
    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        epoch_dir = os.path.join(self.data_dir, f"batch={batch_id}")
        if batch_id in self.committed_batches():
            # replayed epoch → data no-op (exactly-once). A crash between
            # the ledger commit and the lineage append below would have
            # lost that epoch's lineage record forever (ADVICE round-2);
            # the row count is recomputable from the committed epoch dir,
            # so backfill it here instead of under-recording
            if batch_id not in self._lineage_ids():
                n = batch_df.sparkSession.read.parquet(epoch_dir).count()
                self._append_lineage(batch_id, n)
            return
        batch_df.write.mode("overwrite").parquet(epoch_dir)
        # row count from the written parquet footers — never batch_df.count(),
        # which would re-execute the whole micro-batch plan a second time
        n = batch_df.sparkSession.read.parquet(epoch_dir).count()
        self._commit(batch_id)
        # lineage strictly AFTER the atomic commit: a crash between the two
        # re-runs as a ledger-hit replay, which backfills the record above —
        # the record appears exactly once across crashes; the reverse order
        # could double-log a replayed epoch (data stays exactly-once either
        # way)
        self._append_lineage(batch_id, n)

    # --------------------------------------------------------------- read
    def read(self, spark: SparkSession) -> DataFrame:
        batches = self.committed_batches()
        if not batches:
            raise FileNotFoundError(f"no committed epochs under {self.path}")
        # one partition-discovered scan — the epoch directories are named
        # batch=<id>, so `batch` is a partition column and the committed-set
        # filter is PARTITION PRUNING (uncommitted crash leftovers are never
        # read). O(1) plan size regardless of epoch count, unlike a
        # per-epoch union.
        df = spark.read.parquet(self.data_dir).filter(
            F.col("batch").isin([int(b) for b in batches])
        )
        if self.merge_keys:
            # merge-on-read: latest committed epoch wins per key
            w = Window.partitionBy(*self.merge_keys).orderBy(F.desc("batch"))
            df = (
                df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        return df.drop("batch")

    def row_count(self, spark: SparkSession) -> int:
        try:
            return self.read(spark).count()
        except FileNotFoundError:
            return 0


class FanoutSink:
    """Exactly-once fan-out: ONE micro-batch, N destinations, ONE commit.

    The reference pipeline delivers each joined record to BOTH a Kafka
    topic and the InfluxDB store (``ts_join_with_kafka_eos.py`` producing
    the topic that ``db_connector.py:21-66`` consumes); the lakehouse
    form is a single ``foreachBatch`` feeding several tables (full pairs
    to one, a projection/rollup to a dashboard table). The hazard is a
    crash between the per-destination writes: destination A has the
    epoch, destination B does not. This sink closes it with one SHARED
    ledger as the only commit point — an epoch is committed only after
    EVERY destination's deterministic write landed, so a mid-fan-out
    crash replays the whole epoch (overwrite, idempotent) and readers of
    any destination see all-or-nothing epochs. Per-destination
    transforms run on the batch DataFrame (plain batch API inside
    ``foreachBatch``).
    """

    def __init__(self, path: str, transforms: dict):
        """``transforms``: destination name -> callable(batch_df) ->
        DataFrame (identity = ``lambda df: df``)."""
        if not transforms:
            raise ValueError("FanoutSink needs at least one destination")
        self.path = path
        self.transforms = dict(transforms)
        self.ledger_path = os.path.join(path, "ledger.json")
        self.lineage_path = os.path.join(path, "lineage.jsonl")
        for name in self.transforms:
            os.makedirs(os.path.join(path, name, "data"), exist_ok=True)

    committed_batches = IdempotentBatchSink.committed_batches
    _commit = IdempotentBatchSink._commit
    _lineage_ids = IdempotentBatchSink._lineage_ids

    def _epoch_dir(self, name: str, batch_id: int) -> str:
        return os.path.join(self.path, name, "data", f"batch={batch_id}")

    def _append_lineage(self, batch_id: int, counts: dict) -> None:
        with open(self.lineage_path, "a") as f:
            f.write(json.dumps({"batch_id": batch_id, "rows": counts}) + "\n")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_id in self.committed_batches():
            if batch_id not in self._lineage_ids():  # crash-lost record
                counts = {
                    name: spark.read.parquet(
                        self._epoch_dir(name, batch_id)
                    ).count()
                    for name in self.transforms
                }
                self._append_lineage(batch_id, counts)
            return
        counts = {}
        for name, fn in self.transforms.items():
            out = fn(batch_df)
            epoch_dir = self._epoch_dir(name, batch_id)
            out.write.mode("overwrite").parquet(epoch_dir)
            counts[name] = spark.read.parquet(epoch_dir).count()
        # the ONE commit point, strictly after every destination landed
        self._commit(batch_id)
        self._append_lineage(batch_id, counts)

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        if name not in self.transforms:
            raise KeyError(name)
        batches = self.committed_batches()
        if not batches:
            raise FileNotFoundError(f"no committed epochs under {self.path}")
        # partition-pruned committed-epoch scan, as in IdempotentBatchSink
        df = spark.read.parquet(os.path.join(self.path, name, "data")).filter(
            F.col("batch").isin([int(b) for b in batches])
        )
        return df.drop("batch")


class UpsertTableSink:
    """foreachBatch → conditional ``MERGE INTO`` a :class:`TableHandle`:
    the streaming latest-wins upsert sink.

    This is the lakehouse form of the reference's InfluxDB sink, whose
    tags+time unique key makes every write an upsert and therefore makes
    replayed epochs harmless (reference ``db_connector.py:53-66``). Here
    the same contract holds through TWO independent layers, either of
    which alone suffices:

    1. an epoch ledger (as :class:`IdempotentBatchSink`): a batch id
       already committed is skipped outright;
    2. the merge itself is LAST-WRITER-WINS-BY-``order_cols`` via
       ``WHEN MATCHED AND struct(s.<order>) >= struct(t.<order>)``
       (``TableHandle.merge_into(match_condition=...)``) — re-merging an
       already-applied batch replaces rows with identical rows, i.e. is
       the identity. A crash BETWEEN the merge commit and the ledger
       write therefore replays as a data no-op.

    Each micro-batch is first pre-reduced to ONE row per key with the
    same hot-key-safe ``max(struct(...))`` aggregation log compaction
    uses (``sources/tables._latest_by_key`` shape — map-side combinable,
    no ``row_number`` window), which also satisfies MERGE's cardinality
    rule. ``order_cols`` should totally order each key's rows (e.g.
    ``["ts_us", "event_id"]``); ties beyond ``order_cols`` break by the
    remaining columns in declared order, deterministically.

    Scale shape: the merge is file-level copy-on-write — per epoch the
    work is O(touched files + batch), never O(table); with the table
    partitioned on a coarse column, an epoch touching few partitions
    relinks everything else.
    """

    def __init__(self, table, keys: list[str], order_cols: list[str]):
        if not order_cols:
            raise ValueError("order_cols must be non-empty")
        overlap = set(keys) & set(order_cols)
        if overlap:
            raise ValueError(
                f"order_cols must be disjoint from keys: {sorted(overlap)}"
            )
        self.table = table
        self.keys = list(keys)
        self.order_cols = list(order_cols)
        self.ledger_path = os.path.join(table.path, "sink_ledger.json")
        self.path = table.path  # _commit writes its tempfile here

    committed_batches = IdempotentBatchSink.committed_batches
    _commit = IdempotentBatchSink._commit

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self.committed_batches():
            return  # layer 1: ledger-hit replay is a full no-op
        cols = batch_df.columns
        latest = (
            batch_df.groupBy(*self.keys)
            .agg(
                F.max(
                    F.struct(
                        F.struct(*self.order_cols).alias("__o"),
                        F.struct(*cols).alias("__r"),
                    )
                ).alias("__m")
            )
            .select("__m.__r.*")
        )
        s_ord = ", ".join(f"s.{c}" for c in self.order_cols)
        t_ord = ", ".join(f"t.{c}" for c in self.order_cols)
        self.table.merge_into(
            latest,
            self.keys,
            match_condition=f"struct({s_ord}) >= struct({t_ord})",
        )
        self._commit(batch_id)

    def read(self) -> DataFrame:
        return self.table.read()
