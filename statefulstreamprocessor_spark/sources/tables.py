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

import functools
import json
import os
import shutil
import tempfile
import time
import urllib.parse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["create_table", "load_table", "TableHandle"]

_META = "_table_metadata.json"


def _latest_by_key(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Max-``order_col`` row per key as ONE map-side-combinable
    ``max(struct(order_col, row))`` aggregation — hot-key-safe (no
    ``row_number`` window; DESIGN rule 5). Ties on ``order_col`` break
    by the remaining columns in declared order."""
    return (
        df.groupBy(*keys)
        .agg(
            F.max(
                F.struct(
                    F.col(order_col).alias("__o"),
                    F.struct(*df.columns).alias("__r"),
                )
            ).alias("__m")
        )
        .select("__m.__r.*")
    )


def _path_from_uri(uri: str) -> str:
    """``input_file_name()`` URI (``file:///…``, possibly %-escaped) →
    local filesystem path comparable with :meth:`TableHandle.data_files`."""
    parsed = urllib.parse.urlparse(uri)
    return urllib.parse.unquote(parsed.path) if parsed.scheme else uri


class TableHandle:
    def __init__(self, spark: SparkSession, path: str, schema_ddl: str,
                 partition_by: list[str], version: int = 0,
                 data_name: str = "data", prev_data_name: str | None = None,
                 snapshots: list[dict] | None = None,
                 retain_snapshots: int = 2):
        self.spark = spark
        self.path = path
        self.schema_ddl = schema_ddl
        self.partition_by = partition_by
        self._version = version
        self._data_name = data_name
        if snapshots is None:
            # legacy two-pointer metadata → synthesize the snapshot log
            snapshots = []
            if prev_data_name:
                snapshots.append(
                    {"version": version - 1, "data_dir": prev_data_name,
                     "committed_at": None}
                )
            snapshots.append(
                {"version": version, "data_dir": data_name,
                 "committed_at": None}
            )
        self.snapshots = snapshots
        self.retain_snapshots = max(int(retain_snapshots), 1)

    @property
    def _prev_data_name(self) -> str | None:
        return (
            self.snapshots[-2]["data_dir"] if len(self.snapshots) > 1 else None
        )

    @property
    def data_dir(self) -> str:
        return os.path.join(self.path, self._data_name)

    def _write_meta(self) -> None:
        """Atomically publish the current handle state (the single commit
        point every action funnels through). The legacy ``data_dir`` /
        ``previous_data_dir`` mirrors stay for handles/readers built
        against the two-pointer format."""
        meta = {
            "schema": self.schema_ddl,
            "partition_by": self.partition_by,
            "version": self._version,
            "data_dir": self._data_name,
            "previous_data_dir": self._prev_data_name,
            "snapshots": self.snapshots,
            "retain_snapshots": self.retain_snapshots,
        }
        fd, tmp = tempfile.mkstemp(dir=self.path)
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self.path, _META))  # atomic commit

    # ------------------------------------------------------------- commit
    def _commit_swap(self, staged_data: str) -> None:
        """Atomically replace the table's data with ``staged_data``.

        Iceberg-style versioned commit: the new file set moves to a fresh
        ``data-<version>`` directory, then ONE ``os.replace`` of the
        metadata file makes it current. A crash at any point leaves the
        metadata referencing a complete directory (old or new, never a
        mix, never missing). The last ``retain_snapshots`` version dirs
        are RETAINED (default 2: current + previous) so a reader that
        resolved older metadata and is mid-scan keeps its snapshot (real
        old-or-new isolation), and :meth:`read_version` /
        :meth:`read_as_of` can travel to any retained snapshot; versions
        past the horizon — plus crashed staging leftovers — are swept
        here. Snapshots that share carried (hard-linked) files are safe
        to sweep in any order: removal only drops directory entries,
        never shared file content. :meth:`vacuum` reclaims retained
        history early once no reader needs it. Single-maintainer
        semantics (like Iceberg's maintenance actions, which take a
        table lock).
        """
        new_version = self._version + 1
        new_name = f"data-{new_version:05d}"
        os.replace(staged_data, os.path.join(self.path, new_name))
        self._version, self._data_name = new_version, new_name
        self.snapshots = (
            self.snapshots
            + [{"version": new_version, "data_dir": new_name,
                "committed_at": time.time()}]
        )[-self.retain_snapshots:]
        self._write_meta()
        self._sweep(keep={s["data_dir"] for s in self.snapshots})

    def _sweep(self, keep: set[str]) -> None:
        """Best-effort removal of version dirs / staging leftovers not in
        ``keep``."""
        for entry in os.listdir(self.path):
            full = os.path.join(self.path, entry)
            if entry in keep or not os.path.isdir(full):
                continue
            if entry == "data" or entry.startswith(
                ("data-", "rewrite_", "compact_", "merge_")
            ):
                shutil.rmtree(full, ignore_errors=True)

    def vacuum(self, retain_last: int = 1) -> None:
        """Expire superseded snapshots early (Iceberg
        ``expire_snapshots``): keep only the newest ``retain_last``
        retained snapshots (default 1 = the current version only) and
        delete the expired version dirs. Call when no reader still holds
        an older snapshot. The snapshot log shrinks in the SAME atomic
        metadata commit — a reloaded handle sees "vacuumed", never a
        dangling path that reads as on-disk corruption."""
        retain_last = max(int(retain_last), 1)
        self.snapshots = self.snapshots[-retain_last:]
        self._write_meta()
        self._sweep(keep={s["data_dir"] for s in self.snapshots})

    def changelog(
        self,
        from_version: int | None = None,
        to_version: int | None = None,
    ) -> DataFrame:
        """Row-level change feed between two retained snapshots
        (Iceberg incremental changelog scan, enabled by the snapshot
        retention in :meth:`_commit_swap`).

        Defaults reproduce the classic single-step feed: ``from`` = the
        previous retained snapshot, ``to`` = the current table. Passing
        explicit versions (any two retained by ``retain_snapshots`` /
        :meth:`vacuum`) yields the NET delta across the whole version
        range — e.g. ``changelog(0, 3)`` collapses three commits into
        one CDC batch, and a row upserted then deleted inside the range
        cancels out entirely, exactly like replaying the per-commit
        feeds and summing.

        Output: the table columns plus ``_change`` — the net multiset
        delta per distinct row (positive = inserted over the range,
        negative = deleted); unchanged rows are absent, so a pure
        bin-pack compaction yields an EMPTY changelog. Shape: the two
        snapshots union with ±1 weights into ONE map-side-combinable
        aggregation over the row — no join, one exchange, partials
        collapse in the scan tasks.
        """
        schema = self.spark.createDataFrame([], self.schema_ddl).schema
        cols = [f.name for f in schema.fields]
        if to_version is None:
            cur = self.spark.read.schema(schema).parquet(self.data_dir)
        else:
            cur = self.read_version(to_version)
        if from_version is None:
            if not self._prev_data_name:
                raise ValueError(
                    "no previous snapshot retained (nothing committed "
                    "yet, or it was vacuumed)"
                )
            prev_dir = os.path.join(self.path, self._prev_data_name)
            if not os.path.isdir(prev_dir):
                raise ValueError(
                    f"previous snapshot missing: {prev_dir}"
                )
            prev = self.spark.read.schema(schema).parquet(prev_dir)
        else:
            prev = self.read_version(from_version)
        cur = cur.select(*cols, F.lit(1).alias("__w"))
        prev = prev.select(*cols, F.lit(-1).alias("__w"))
        return (
            cur.unionByName(prev)
            .groupBy(*cols)
            .agg(F.sum("__w").alias("_change"))
            .filter(F.col("_change") != 0)
        )

    # ------------------------------------------------------------- write
    def append(self, df: DataFrame) -> None:
        """Append rows under the declared partition spec (schema-checked).

        Contract (ADVICE r06): ``append`` extends the CURRENT snapshot
        in place — it does NOT bump the version or write a snapshot-log
        entry. The current snapshot is therefore MUTABLE until the next
        ``_commit_swap`` mutation (merge/compact/rewrite) seals it;
        ``read_version``/``read_as_of``/``changelog`` see appended rows
        as part of whatever version is current when the next commit
        happens, and ``committed_at`` of the current version does not
        move on append. Callers needing an immutable boundary after a
        batch of appends should follow with a committing mutation.
        (Making append itself a staged commit would renumber the version
        sequence every existing caller observes — deferred to a build
        round; this round's oracle surface is frozen.)
        """
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
        """Time travel to the immediately-superseded retained snapshot —
        shorthand for :meth:`read_version` of the second-newest entry in
        the snapshot log. Raises if nothing is retained (fresh table or
        vacuumed)."""
        if not self._prev_data_name:
            raise ValueError(
                "no previous snapshot retained (nothing committed yet, "
                "or it was vacuumed)"
            )
        return self.read_version(self.snapshots[-2]["version"])

    def _read_snapshot_dir(self, data_name: str) -> DataFrame:
        """Read a retained snapshot dir with the CURRENT declared schema —
        columns added since that snapshot come back NULL, the same
        read-time fill :meth:`add_column` relies on."""
        snap_dir = os.path.join(self.path, data_name)
        if not os.path.isdir(snap_dir):
            raise ValueError(f"snapshot missing on disk: {snap_dir}")
        return self.spark.read.schema(
            self.spark.createDataFrame([], self.schema_ddl).schema
        ).parquet(snap_dir)

    def read_version(self, version: int) -> DataFrame:
        """Iceberg ``VERSION AS OF``: read any snapshot still inside the
        retention horizon (``retain_snapshots`` rolling, or what
        :meth:`vacuum` left). Raises for an unknown or expired version —
        never silently substitutes a different one."""
        for s in self.snapshots:
            if s["version"] == version:
                return self._read_snapshot_dir(s["data_dir"])
        retained = [s["version"] for s in self.snapshots]
        raise ValueError(
            f"version {version} is not retained (have {retained}); it "
            "either never existed or was expired by retention/vacuum"
        )

    def read_as_of(self, ts: "float | object") -> DataFrame:
        """Iceberg ``TIMESTAMP AS OF``: the newest retained snapshot
        committed at or before ``ts`` (epoch seconds or a datetime).
        Snapshots from legacy metadata without a commit time are skipped
        (their commit instant is unknown)."""
        if hasattr(ts, "timestamp"):
            ts = ts.timestamp()
        ts = float(ts)
        best = None
        for s in self.snapshots:
            at = s.get("committed_at")
            if at is not None and at <= ts and (
                best is None or at > best.get("committed_at")
            ):
                best = s
        if best is None:
            raise ValueError(
                f"no retained snapshot committed at or before {ts}"
            )
        return self._read_snapshot_dir(best["data_dir"])

    def history(self) -> DataFrame:
        """Union of every retained snapshot, each row tagged with its
        snapshot version in ``_version`` (bigint) — the versioned feed
        :func:`..operators.scd2.scd2_history` collapses into SCD2
        ranges. One scan per retained snapshot (retention is a small
        admin knob), no shuffle here; downstream ops decide their own
        exchanges. Raises if the input already carries a ``_version``
        column."""
        schema = self.spark.createDataFrame([], self.schema_ddl).schema
        if "_version" in {f.name for f in schema.fields}:
            raise ValueError("table already has a _version column")
        if not self.snapshots:
            raise ValueError("no retained snapshots")
        out = None
        for s in self.snapshots:
            part = self._read_snapshot_dir(s["data_dir"]).withColumn(
                "_version", F.lit(int(s["version"])).cast("bigint")
            )
            out = part if out is None else out.unionByName(part)
        return out

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
        self.schema_ddl = new_ddl
        self._write_meta()

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

    def rewrite_clustered(
        self, cluster_by: list[str], target_files: int
    ) -> int:
        """Iceberg sort-order rewrite (``rewrite_data_files`` with a
        sort strategy): globally range-partition the table into
        ``target_files`` contiguous ``cluster_by`` ranges
        (``repartitionByRange`` samples the key distribution, so the
        ranges are balanced even under skew) and sort within each, so
        every data file carries a TIGHT min/max envelope on the cluster
        columns and a range scan opens O(matching files) via
        :meth:`read_between` (data skipping). Commits via
        :meth:`_commit_swap`; hive partition columns keep their
        directory layout (a range task spanning several partition
        values writes one file per value — envelopes stay tight).
        Returns the new data-file count.
        """
        if target_files < 1:
            raise ValueError(f"target_files must be >= 1, got {target_files}")
        if not cluster_by:
            raise ValueError("cluster_by must name at least one column")
        df = self.read()
        staged = tempfile.mkdtemp(prefix="rewrite_", dir=self.path)
        w = (
            df.repartitionByRange(
                target_files, *[F.col(c) for c in cluster_by]
            )
            .sortWithinPartitions(*cluster_by)
            .write.mode("overwrite")
        )
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.parquet(os.path.join(staged, "data"))
        self._commit_swap(os.path.join(staged, "data"))
        return len(self.data_files())

    def file_column_stats(
        self, col: str
    ) -> list[tuple[str, object, object]]:
        """Per-data-file ``(path, min, max)`` of ``col``, read from the
        parquet footers — the sandbox stand-in for the per-file column
        bounds an Iceberg manifest carries. Driver-side O(files) footer
        reads (the same cost class as an Iceberg manifest walk), no
        Spark job. A file whose footer lacks usable stats for the
        column reports ``(None, None)`` — callers must treat that as
        "may contain anything" (fail open). Parquet writers guarantee
        written chunk stats bound the data (oversized stats are dropped,
        never truncated incorrectly), which is what makes footer-based
        skipping sound."""
        import pyarrow.parquet as pq

        if col in self.partition_by:
            raise ValueError(
                f"{col!r} is a hive partition column — its values live "
                "in directory names, not file footers; partition "
                "pruning already skips those directories"
            )
        out: list[tuple[str, object, object]] = []
        for f in self.data_files():
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            if col not in names:
                out.append((f, None, None))
                continue
            ci = names.index(col)
            lo = hi = None
            ok = True
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                lo = st.min if lo is None or st.min < lo else lo
                hi = st.max if hi is None or st.max > hi else hi
            out.append((f, lo, hi) if ok else (f, None, None))
        return out

    def files_between(self, col: str, lo, hi) -> list[str]:
        """The data files whose ``col`` envelope overlaps ``[lo, hi]``
        (inclusive), plus every file without stats — pruning is a
        pure superset optimization and must never change results."""
        keep = []
        for f, mn, mx in self.file_column_stats(col):
            if mn is None or mx is None or (mx >= lo and mn <= hi):
                keep.append(f)
        return keep

    def read_between(self, col: str, lo, hi) -> DataFrame:
        """Range scan with file-level data skipping: open only the
        files :meth:`files_between` keeps, then apply the residual
        ``BETWEEN`` filter — identical rows to
        ``read().filter(col BETWEEN lo AND hi)`` by construction; the
        envelopes only decide how many files get OPENED. After
        :meth:`rewrite_clustered` on ``col`` the kept set is the few
        overlapping ranges; on unclustered data envelopes straddle the
        range and the scan degrades gracefully toward opening
        everything (still correct)."""
        schema = self.spark.createDataFrame([], self.schema_ddl).schema
        pred = (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
        files = self.files_between(col, lo, hi)
        if not files:
            return self.spark.createDataFrame([], schema)
        return (
            self.spark.read.option("basePath", self.data_dir)
            .schema(schema)
            .parquet(*files)
            .filter(pred)
        )

    def merge_into(
        self,
        source: DataFrame,
        keys: list[str],
        when_matched: str = "update",
        match_condition: str | None = None,
        update_exprs: dict[str, str] | None = None,
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

        ``match_condition`` (Iceberg ``WHEN MATCHED AND <cond> THEN``): a
        SQL boolean over aliases ``s`` (source row) and ``t`` (target
        row), e.g. ``"s.ts > t.ts"``. A matched target row is replaced /
        deleted only when the condition holds; a matched source row that
        fails it against some target row is DROPPED (it matched, so it
        is not an insert — Iceberg's "matched but no clause applies"
        no-op). Unmatched source rows still insert in update mode. With
        e.g. ``"struct(s.ts, ...) >= struct(t.ts, ...)"`` this makes the
        upsert LAST-WRITER-WINS-BY-EVENT-TIME and therefore IDEMPOTENT
        under replay — re-merging an already-applied batch changes
        nothing — the contract the reference's InfluxDB sink gets from
        tags+time upserts (reference ``db_connector.py:53-66``). The
        condition may evaluate NULL for a matched pair (a nullable
        order column, say): NULL is treated as "condition did not
        fire" on BOTH sides — the target row stays and the source row
        is consumed without inserting, exactly like SQL MERGE's
        ``WHEN MATCHED AND <cond>`` with an unknown condition
        (ADVICE r06: the two anti-joins previously both kept their row
        on NULL, duplicating the key).

        ``update_exprs`` (Iceberg ``WHEN MATCHED THEN UPDATE SET``):
        per-column SQL expressions over aliases ``t``/``s`` applied to
        MATCHED rows instead of whole-row replacement — e.g.
        ``{"cnt": "t.cnt + s.cnt", "sum_v": "t.sum_v + s.sum_v"}``
        turns the merge into an ARITHMETIC upsert: O(delta) incremental
        maintenance of a materialized rollup from a :meth:`changelog`
        feed, instead of recomputing the aggregate from the full base
        table. Columns not listed keep the target's value; merge keys
        cannot be updated; every expression must produce the column's
        declared type (checked, loud — a silent widening would corrupt
        the table schema). Unmatched source rows still INSERT as-is,
        and ``match_condition`` composes (matched rows failing it stay
        untouched, their source rows drop). Note the asymmetry with
        plain update mode: there a matched source row REPLACES the
        target; here it feeds expressions.

        Scale shape — file-level copy-on-write, O(touched files + delta)
        like Iceberg's MERGE, never O(table) (round-6; the previous
        full-snapshot staging rewrote every file for a one-row upsert):

        1. the source is ``persist()``-ed once, so the cardinality
           check, the match scan and the committed rows all see the SAME
           source rows (a non-deterministic source cannot pass the
           duplicate check yet commit duplicates), and deterministic
           sources aren't recomputed three times;
        2. one narrow scan (merge keys + ``input_file_name``) semi-joins
           the source's distinct keys to find the TOUCHED data files —
           the file set holding at least one matched row; the collected
           list is O(touched files), the same driver-side footprint as
           an Iceberg manifest walk;
        3. only those files are re-read (plus ``basePath`` to recover
           hive partition columns) and anti-joined to drop matched rows;
           the source rows union in (update mode) and the result stages
           as fresh parquet;
        4. every UNTOUCHED file is carried into the new snapshot by
           hard link — byte-identical, no data copied (the sandbox
           analogue of Iceberg carrying untouched files by manifest
           reference; falls back to a copy if the filesystem refuses
           links);
        5. the usual atomic :meth:`_commit_swap` publishes the snapshot,
           so :meth:`changelog` shows exactly the merged delta.
        """
        if when_matched not in ("update", "delete"):
            raise ValueError(
                f"when_matched must be update|delete, got {when_matched!r}"
            )
        declared = self.spark.createDataFrame([], self.schema_ddl).schema
        if update_exprs is not None:
            if when_matched != "update":
                raise ValueError(
                    "update_exprs requires when_matched='update'"
                )
            declared_names = {f.name for f in declared.fields}
            for c in update_exprs:
                if c in keys:
                    raise ValueError(f"merge key {c!r} cannot be updated")
                if c not in declared_names:
                    raise ValueError(
                        f"update_exprs column {c!r} is not a table column"
                    )
        if when_matched == "update":
            got = {f.name: f.dataType for f in source.schema.fields}
            want = {f.name: f.dataType for f in declared.fields}
            if got != want:
                raise ValueError(
                    f"schema mismatch: table declares {want}, merge source "
                    f"got {got}"
                )
        source = source.persist()
        try:
            if when_matched == "update":
                # Iceberg's MERGE cardinality error: two source rows
                # updating one key would be a nondeterministic pick.
                # Delete-by-key is insensitive to source duplicates, so
                # only update checks.
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
                        f"{tuple(dup[0][k] for k in keys)!r} — MERGE "
                        "requires at most one source row per target key"
                    )
            src_keys = source.select(*keys).distinct()
            touched = sorted(
                {
                    _path_from_uri(r["__f"])
                    for r in self.read()
                    .select(*keys, F.input_file_name().alias("__f"))
                    .join(src_keys, keys, "left_semi")
                    .select("__f")
                    .distinct()
                    .collect()
                }
            )
            if not touched and (
                when_matched == "delete" or not source.take(1)
            ):
                return  # nothing matched, nothing to insert — no-op
            tgt = (
                self.spark.read.option("basePath", self.data_dir)
                .schema(declared)
                .parquet(*touched)
                if touched
                else self.spark.createDataFrame([], declared)
            )
            src_declared = source.select(*[f.name for f in declared]) \
                if when_matched == "update" else source
            if update_exprs is not None:
                # WHEN MATCHED THEN UPDATE SET — matched pairs feed the
                # per-column expressions (inner equi-join on the keys,
                # condition as a post-join filter predicate); unmatched
                # targets pass through an anti join on the same
                # predicate; unmatched sources insert via an anti join
                # on the keys alone. Same one-key-shuffle scale shape
                # as the replace path: touched files + delta, no cross
                # product.
                keys_eq = [
                    F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
                    for k in keys
                ]
                keys_pred = functools.reduce(lambda a, b: a & b, keys_eq)
                match_pred = (
                    keys_pred & F.expr(match_condition)
                    if match_condition is not None
                    else keys_pred
                )
                out_cols = [
                    F.expr(update_exprs[f.name]).alias(f.name)
                    if f.name in update_exprs
                    else F.col(f"t.{f.name}").alias(f.name)
                    for f in declared.fields
                ]
                updated = (
                    tgt.alias("t")
                    .join(source.alias("s"), match_pred, "inner")
                    .select(*out_cols)
                )
                got_u = {f.name: f.dataType for f in updated.schema.fields}
                want_u = {f.name: f.dataType for f in declared.fields}
                if got_u != want_u:
                    raise ValueError(
                        "update_exprs change column types: table "
                        f"declares {want_u}, update produced {got_u}"
                    )
                survivors = tgt.alias("t").join(
                    source.alias("s"), match_pred, "left_anti"
                )
                winners = updated.unionByName(
                    src_declared.alias("s").join(
                        tgt.alias("t"), keys_pred, "left_anti"
                    )
                )
            elif match_condition is None:
                survivors = tgt.join(src_keys, keys, "left_anti")
                winners = src_declared
            else:
                # conditional clause: both sides are equi-keyed anti
                # joins with the condition as an extra join predicate —
                # Catalyst plans them as hash/sort-merge anti joins on
                # the keys with the condition as a post-join filter, so
                # the scale shape stays one key shuffle over the touched
                # files + delta, never a cross product.
                keys_eq = [
                    F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
                    for k in keys
                ]
                cond = F.expr(match_condition)
                # target rows beaten by some source row leave; the rest
                # stay (including matched rows the condition spared)
                survivors = (
                    tgt.alias("t")
                    .join(
                        source.alias("s"),
                        functools.reduce(lambda a, b: a & b, keys_eq)
                        & cond,
                        "left_anti",
                    )
                )
                # NULL condition == clause does not fire (SQL MERGE
                # semantics): the survivors side already keeps the
                # target on NULL (keys & NULL is not TRUE for the anti
                # join), so the winners side must DROP the matched
                # source row on NULL too — `cond IS NOT TRUE`, not
                # `~cond` (which is NULL on NULL and kept the source,
                # duplicating the key — ADVICE r06)
                winners = (
                    src_declared.alias("s")
                    .join(
                        tgt.alias("t"),
                        functools.reduce(lambda a, b: a & b, keys_eq)
                        & F.expr(f"({match_condition}) IS NOT TRUE"),
                        "left_anti",
                    )
                    if when_matched == "update"
                    else src_declared
                )
            merged = (
                survivors.unionByName(winners)
                if when_matched == "update"
                else survivors
            )
            staged = tempfile.mkdtemp(prefix="merge_", dir=self.path)
            wr = merged.write.mode("overwrite")
            if self.partition_by:
                wr = wr.partitionBy(*self.partition_by)
            wr.parquet(os.path.join(staged, "data"))
            touched_set = set(touched)
            for f in self.data_files():
                if f in touched_set:
                    continue
                rel = os.path.relpath(f, self.data_dir)
                dst = os.path.join(staged, "data", rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                try:
                    os.link(f, dst)
                except OSError:
                    shutil.copy2(f, dst)
            self._commit_swap(os.path.join(staged, "data"))
        finally:
            source.unpersist()

    def compact_latest_by_key(self, keys: list[str], order_col: str) -> None:
        """Kafka log-compaction analogue: keep the max-``order_col`` row
        per key, committed atomically via :meth:`_commit_swap`.

        One ``max(struct(order_col, row))`` aggregation — map-side
        combinable, so a hot key reduces inside every scan task instead
        of funnelling its whole history through one ``row_number``
        window partition (the engine-wide DESIGN rule 5 this method
        violated until round 6). Ties on ``order_col`` break by the
        remaining columns in declared order (deterministic; requires
        orderable column types — no maps)."""
        latest = _latest_by_key(self.read(), keys, order_col)
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
    retain_snapshots: int = 2,
) -> TableHandle:
    """Declare a partitioned table (errors if it already exists).

    ``retain_snapshots``: how many snapshots each maintenance commit
    keeps (rolling; ≥ 1). 2 (default) = current + previous — enough for
    :meth:`TableHandle.changelog` / :meth:`TableHandle.read_previous`;
    larger values give deeper :meth:`TableHandle.read_version` /
    :meth:`TableHandle.read_as_of` time travel."""
    meta_path = os.path.join(path, _META)
    if os.path.exists(meta_path):
        raise FileExistsError(f"table already exists at {path}")
    os.makedirs(os.path.join(path, "data-00000"), exist_ok=True)
    handle = TableHandle(
        spark, path, schema_ddl, partition_by or [], 0, "data-00000",
        snapshots=[{"version": 0, "data_dir": "data-00000",
                    "committed_at": time.time()}],
        retain_snapshots=retain_snapshots,
    )
    handle._write_meta()
    return handle


def load_table(spark: SparkSession, path: str) -> TableHandle:
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    # pre-versioning tables (no version/data_dir keys) keep reading "data"
    return TableHandle(
        spark, path, meta["schema"], meta["partition_by"],
        meta.get("version", 0), meta.get("data_dir", "data"),
        meta.get("previous_data_dir"),
        snapshots=meta.get("snapshots"),
        retain_snapshots=meta.get("retain_snapshots", 2),
    )
