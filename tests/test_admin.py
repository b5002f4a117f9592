"""Table administration (S10) + broker-free Kafka contract (S5/S8).

Mirrors the reference's topic admin (test_kafka_eos_joiner.py:119-139:
partitions, cleanup.policy=compact) and its manual-offset consumption
(ts_join_with_kafka_eos.py:41-49, 151-156) against the parquet stand-ins.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from statefulstreamprocessor_spark.sources.streams import (
    KAFKA_WIRE_DDL,
    deserialize_kafka_json,
    kafka_like_stream,
)
from statefulstreamprocessor_spark.sources.tables import (
    create_table,
    load_table,
)

DDL = "url string, warc_ts timestamp_ntz, lang string, n bigint"


def _rows(spark, k, base=0):
    return spark.createDataFrame(
        [(f"u{i}", None, ["en", "de"][i % 2], base + i) for i in range(k)],
        DDL,
    )


def test_create_append_read_roundtrip(spark, tmp_path):
    t = create_table(spark, str(tmp_path / "t"), DDL, partition_by=["lang"])
    t.append(_rows(spark, 6))
    t.append(_rows(spark, 4, base=100))
    got = t.read().count()
    assert got == 10
    # partition layout on disk (Iceberg-style identity partitioning)
    assert any("lang=en" in p for p in t.data_files())
    # schema enforcement
    with pytest.raises(ValueError):
        t.append(spark.createDataFrame([(1,)], "x int"))
    with pytest.raises(FileExistsError):
        create_table(spark, str(tmp_path / "t"), DDL)


def test_rewrite_data_files_compacts(spark, tmp_path):
    t = create_table(spark, str(tmp_path / "t"), DDL, partition_by=["lang"])
    for i in range(5):  # many small files per partition
        t.append(_rows(spark, 4, base=i * 10).repartition(4))
    before = len(t.data_files())
    total_before = t.read().count()
    after = t.rewrite_data_files(target_files_per_partition=1)
    assert after < before
    reopened = load_table(spark, str(tmp_path / "t"))
    assert reopened.read().count() == total_before


def test_rewrite_respects_target_files_per_partition(spark, tmp_path):
    """target>1 must actually spread each partition over multiple files
    (the old repartition(target, *partition_cols) hashed every partition
    value to ONE task — ADVICE round-2); and never exceed the target."""
    t = create_table(spark, str(tmp_path / "t"), DDL, partition_by=["lang"])
    t.append(_rows(spark, 40))
    t.rewrite_data_files(target_files_per_partition=2)
    per_dir: dict[str, int] = {}
    for f in t.data_files():
        per_dir[os.path.dirname(f)] = per_dir.get(os.path.dirname(f), 0) + 1
    assert per_dir and all(n <= 2 for n in per_dir.values()), per_dir
    assert any(n == 2 for n in per_dir.values()), per_dir
    assert t.read().count() == 40


def test_maintenance_commit_is_versioned_and_sweeps_leftovers(spark, tmp_path):
    """Crash-safety contract: maintenance commits by pointing the metadata
    at a fresh versioned dir (single atomic os.replace of the metadata), so
    a stale staging dir or an orphaned version dir from a prior crash never
    breaks the next commit — it just gets swept."""
    t = create_table(spark, str(tmp_path / "t"), DDL, partition_by=["lang"])
    t.append(_rows(spark, 8))
    # simulate prior-crash leftovers
    for stale in ("rewrite_stale123", "data-00990"):
        os.makedirs(str(tmp_path / "t" / stale))
        open(str(tmp_path / "t" / stale / "junk.parquet"), "w").close()
    old_dir = t.data_dir
    t.rewrite_data_files(target_files_per_partition=1)
    assert t.data_dir != old_dir and os.path.basename(t.data_dir) == "data-00001"
    with open(str(tmp_path / "t" / "_table_metadata.json")) as f:
        meta = json.load(f)
    assert meta["version"] == 1 and meta["data_dir"] == "data-00001"
    assert not os.path.exists(str(tmp_path / "t" / "rewrite_stale123"))
    assert not os.path.exists(str(tmp_path / "t" / "data-00990"))
    # the immediately-superseded snapshot is RETAINED so an in-flight
    # reader that resolved the old metadata keeps a complete file set
    # (ADVICE round-3: the eager sweep forfeited snapshot isolation)
    assert os.path.exists(old_dir)
    assert spark.read.parquet(old_dir).count() == 8
    assert load_table(spark, str(tmp_path / "t")).read().count() == 8
    # explicit expire_snapshots-style maintenance reclaims it
    t.vacuum()
    assert not os.path.exists(old_dir)
    assert load_table(spark, str(tmp_path / "t")).read().count() == 8


def test_changelog_between_snapshots(spark, tmp_path):
    """Iceberg changelog-scan analogue over the retained previous
    snapshot: a pure bin-pack compaction produces an EMPTY changelog,
    appends since the last commit show +1, log-compaction shows the
    superseded rows at -1, and vacuum forfeits the feed loudly."""
    t = create_table(spark, str(tmp_path / "t"), DDL)
    t.append(_rows(spark, 4, base=0))
    with pytest.raises(ValueError):
        t.changelog()  # nothing committed yet
    t.rewrite_data_files(target_files_per_partition=1)
    assert t.changelog().count() == 0  # compaction: no row-level change
    t.append(_rows(spark, 2, base=100))  # u0/u1 again, higher n
    got = {(r["url"], r["n"], r["_change"]) for r in t.changelog().collect()}
    assert got == {("u0", 100, 1), ("u1", 101, 1)}
    t.compact_latest_by_key(keys=["url"], order_col="n")
    got = {(r["url"], r["n"], r["_change"]) for r in t.changelog().collect()}
    # vs previous snapshot (which held both generations): old u0/u1 gone
    assert got == {("u0", 0, -1), ("u1", 1, -1)}
    # reload from disk: the feed survives process restart via metadata
    t2 = load_table(spark, str(tmp_path / "t"))
    assert {
        (r["url"], r["n"], r["_change"]) for r in t2.changelog().collect()
    } == got
    t.vacuum()
    with pytest.raises(ValueError):
        t.changelog()
    # vacuum clears the metadata pointer too: a RELOADED handle must say
    # "no previous snapshot", never chase a dangling path
    t3 = load_table(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="no previous snapshot"):
        t3.changelog()
    assert t3.read().count() == 4


def test_compact_latest_by_key(spark, tmp_path):
    t = create_table(spark, str(tmp_path / "t"), DDL)
    t.append(_rows(spark, 4, base=0))
    t.append(_rows(spark, 4, base=100))  # same urls, newer n
    t.compact_latest_by_key(keys=["url"], order_col="n")
    got = {(r["url"], r["n"]) for r in t.read().collect()}
    assert got == {(f"u{i}", 100 + i) for i in range(4)}


# ---------------------------------------------------------------- kafka


def _write_offset_range(spark, d, topic, partition, offsets, fname):
    import glob
    import shutil
    import tempfile

    rows = [
        (
            None,
            json.dumps({"thing": "t1", "quantity": "q", "v": float(o)}).encode(),
            topic,
            partition,
            o,
            None,
            0,
        )
        for o in offsets
    ]
    df = spark.createDataFrame(rows, KAFKA_WIRE_DDL)
    # the file stream source lists top-level files only: stage the write and
    # move the single part file into place under a stable name
    staged = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(staged)
    part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(d, f"{fname}.parquet"))
    shutil.rmtree(staged, ignore_errors=True)


def test_kafka_contract_offsets_survive_resume(spark, tmp_path):
    """Checkpoint-owned progress: consume offsets 0-9, stop, add 10-19,
    resume from the same checkpoint — every offset lands in the sink
    exactly once, with (topic, partition, offset) lineage intact."""
    from statefulstreamprocessor_spark.streaming.sink import IdempotentBatchSink

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    _write_offset_range(spark, in_dir, "events", 0, range(0, 10), "f0")
    out = str(tmp_path / "out")

    def run():
        raw = kafka_like_stream(spark, in_dir, max_files_per_trigger=1)
        typed = deserialize_kafka_json(
            raw, "thing string, quantity string, v double"
        )
        sink = IdempotentBatchSink(out)
        q = (
            typed.writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(out, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sink

    s1 = run()
    got1 = [(r["partition"], r["offset"]) for r in s1.read(spark).collect()]
    assert sorted(got1) == [(0, o) for o in range(10)]
    # new offsets arrive; resume from the same checkpoint
    _write_offset_range(spark, in_dir, "events", 0, range(10, 20), "f1")
    s2 = run()
    rows = s2.read(spark).collect()
    got2 = sorted((r["partition"], r["offset"]) for r in rows)
    assert got2 == [(0, o) for o in range(20)], "offset gap or duplicate"
    # deserializer typed the payload and kept lineage
    assert all(r["thing"] == "t1" and r["v"] == float(r["offset"]) for r in rows)


def test_mqtt_qos2_contract_dedups_redeliveries_across_resume(spark, tmp_path):
    """S3's observable QoS 2 contract, broker-free: wire-level
    redeliveries (same packet_id, dup=true — what a lost PUBREC/PUBCOMP
    causes) reach the application EXACTLY ONCE, including a redelivery
    that straddles a consumer kill-and-resume (dedup state lives in the
    checkpoint)."""
    import datetime

    from statefulstreamprocessor_spark.sources.streams import (
        mqtt_like_stream,
        mqtt_qos2_exactly_once,
    )
    from statefulstreamprocessor_spark.streaming.sink import IdempotentBatchSink

    t0 = datetime.datetime(2024, 6, 1)

    def msgs(ids, dup_ids, offset_s=0):
        rows = [
            (i, "machine/temp", f"payload-{i}", 2, False,
             t0 + datetime.timedelta(seconds=i + offset_s))
            for i in ids
        ] + [
            (i, "machine/temp", f"payload-{i}", 2, True,
             t0 + datetime.timedelta(seconds=i + offset_s + 1))
            for i in dup_ids
        ]
        return spark.createDataFrame(
            rows,
            "packet_id bigint, topic string, payload string, qos int, "
            "dup boolean, publish_ts timestamp_ntz",
        )

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    # file 0: packets 0-9, with 3 and 7 redelivered inside the same file
    msgs(range(0, 10), [3, 7]).coalesce(1).write.mode("append").parquet(in_dir)
    out = str(tmp_path / "out")

    def run():
        stream = mqtt_like_stream(spark, in_dir, max_files_per_trigger=1)
        sink = IdempotentBatchSink(out)
        q = (
            mqtt_qos2_exactly_once(stream)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(out, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sink

    s1 = run()
    got1 = sorted(r["packet_id"] for r in s1.read(spark).collect())
    assert got1 == list(range(10))
    # consumer dies; the session redelivers 8 and 9 (dup=true) alongside
    # new packets 10-14 — the restart must still drop them
    msgs(range(10, 15), [8, 9], offset_s=2).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    s2 = run()
    rows = s2.read(spark).collect()
    got2 = sorted(r["packet_id"] for r in rows)
    assert got2 == list(range(15)), "redelivered packet leaked or lost"
    payloads = {r["packet_id"]: r["payload"] for r in rows}
    assert all(payloads[i] == f"payload-{i}" for i in range(15))


def test_merge_into_upsert_delete_and_changelog(spark, tmp_path):
    """Iceberg MERGE INTO analogue: matched keys update, unmatched
    source rows insert, delete mode removes; the changelog after the
    merge is exactly the merged delta; duplicate-key sources and schema
    mismatches raise."""
    t = create_table(spark, str(tmp_path / "t"), DDL, partition_by=["lang"])
    t.append(_rows(spark, 6))  # u0..u5, n=0..5
    src = spark.createDataFrame(
        [
            ("u1", None, "de", 101),   # matched -> update (lang moves too)
            ("u4", None, "en", 104),   # matched -> update
            ("u9", None, "en", 109),   # unmatched -> insert
        ],
        DDL,
    )
    t.merge_into(src, ["url"])
    got = {r["url"]: (r["lang"], r["n"]) for r in t.read().collect()}
    assert got == {
        "u0": ("en", 0), "u2": ("en", 2), "u3": ("de", 3), "u5": ("de", 5),
        "u1": ("de", 101), "u4": ("en", 104), "u9": ("en", 109),
    }
    # changelog vs the pre-merge snapshot: exactly the merged delta
    delta = {
        (r["url"], r["n"]): r["_change"] for r in t.changelog().collect()
    }
    assert delta == {
        ("u1", 1): -1, ("u4", 4): -1,          # replaced rows left
        ("u1", 101): 1, ("u4", 104): 1,        # their updates arrived
        ("u9", 109): 1,                        # the insert
    }
    # delete mode
    t.merge_into(
        spark.createDataFrame([("u9", None, "en", 0)], DDL),
        ["url"],
        when_matched="delete",
    )
    assert sorted(r["url"] for r in t.read().collect()) == [
        "u0", "u1", "u2", "u3", "u4", "u5"
    ]
    # cardinality violation: two source rows for one key
    dup = spark.createDataFrame([("u1", None, "en", 1), ("u1", None, "de", 2)], DDL)
    with pytest.raises(ValueError, match="multiple rows"):
        t.merge_into(dup, ["url"])
    # schema enforcement in update mode
    with pytest.raises(ValueError, match="schema mismatch"):
        t.merge_into(spark.createDataFrame([(1,)], "x int"), ["x"])
    # reload sees the committed state (atomic metadata)
    assert load_table(spark, str(tmp_path / "t")).read().count() == 6


def test_add_column_and_time_travel(spark, tmp_path):
    """Additive schema evolution is metadata-only (old files read with
    NULL fill, no rewrite), and read_previous() time-travels to the
    retained snapshot with current-schema semantics."""
    t = create_table(spark, str(tmp_path / "t"), DDL, partition_by=["lang"])
    t.append(_rows(spark, 4))
    files_before = t.data_files()
    t.add_column("score", "double")
    assert t.data_files() == files_before, "schema evolution rewrote data"
    got = t.read()
    assert "score" in got.columns
    assert got.filter(F.col("score").isNull()).count() == 4
    # appends must now carry the column
    with pytest.raises(ValueError):
        t.append(_rows(spark, 2, base=50))
    t.append(
        spark.createDataFrame(
            [("u9", None, "en", 9, 0.5)], DDL + ", score double"
        )
    )
    assert t.read().filter(F.col("score") == 0.5).count() == 1
    # a reloaded handle sees the evolved schema (atomic metadata commit)
    re = load_table(spark, str(tmp_path / "t"))
    assert "score" in re.read().columns
    with pytest.raises(ValueError, match="already exists"):
        re.add_column("score", "double")
    # time travel: before any maintenance commit there is no snapshot
    with pytest.raises(ValueError, match="no previous snapshot"):
        re.read_previous()
    re.compact_latest_by_key(["url"], "n")
    prev = re.read_previous()
    assert prev.count() == 5  # the pre-compaction row set
    re.vacuum()
    with pytest.raises(ValueError, match="no previous snapshot"):
        re.read_previous()


def test_merge_into_rewrites_only_touched_files(spark, tmp_path):
    """Round-6 file-level copy-on-write (VERDICT r05 "What's wrong #1"):
    a merge touching keys in ONE partition must carry every other
    partition's data files into the new snapshot by reference —
    byte-identical, same inode (hard link), no rewrite — and the
    changelog must still show exactly the delta."""
    t = create_table(spark, str(tmp_path / "t"), DDL, partition_by=["lang"])
    t.append(_rows(spark, 8))  # u0..u7; even→en, odd→de

    def files_by_part(handle):
        out = {}
        for f in handle.data_files():
            rel = os.path.relpath(f, handle.data_dir)
            part = rel.split(os.sep)[0]
            out.setdefault(part, {})[rel] = os.stat(f)
        return out

    before = files_by_part(t)
    # u2 is lang=en: update stays inside the en partition
    t.merge_into(
        spark.createDataFrame([("u2", None, "en", 202)], DDL), ["url"]
    )
    after = files_by_part(t)
    # the de partition's file set is carried by reference: same relpaths,
    # same inodes (byte-identity follows)
    assert set(after["lang=de"]) == set(before["lang=de"])
    for rel, st in before["lang=de"].items():
        assert after["lang=de"][rel].st_ino == st.st_ino, (
            f"{rel} was rewritten, not carried"
        )
    # the en partition rewrote the touched file (u2's new value present)
    got = {r["url"]: r["n"] for r in t.read().collect()}
    assert got["u2"] == 202 and len(got) == 8
    # changelog is exactly the delta
    delta = {(r["url"], r["n"]): r["_change"] for r in t.changelog().collect()}
    assert delta == {("u2", 2): -1, ("u2", 202): 1}
    # no-op merge (no matches, no inserts in delete mode) commits nothing
    v = t._version
    t.merge_into(
        spark.createDataFrame([("zz", None, "en", 0)], DDL),
        ["url"], when_matched="delete",
    )
    assert t._version == v


def test_snapshot_retention_time_travel_three_versions(spark, tmp_path):
    """VERDICT r05 next-round #7: multi-step time travel — with
    retain_snapshots=3 any of the last three snapshots reads back via
    read_version / read_as_of; retention expires the oldest; vacuum
    trims early; expired versions raise rather than mis-read."""
    t = create_table(
        spark, str(tmp_path / "t"), DDL, partition_by=["lang"],
        retain_snapshots=3,
    )
    t.append(_rows(spark, 4))                      # v0: u0..u3
    t.merge_into(
        spark.createDataFrame([("u9", None, "en", 9)], DDL), ["url"]
    )                                               # v1: +u9
    t.merge_into(
        spark.createDataFrame([("u8", None, "de", 8)], DDL), ["url"]
    )                                               # v2: +u8
    assert [s["version"] for s in t.snapshots] == [0, 1, 2]
    assert t.read_version(0).count() == 4
    assert t.read_version(1).count() == 5
    assert t.read_version(2).count() == 6
    # read_as_of: between v1 and v2 commit instants → v1
    at1 = next(s for s in t.snapshots if s["version"] == 1)["committed_at"]
    assert t.read_as_of(at1).count() == 5
    import pytest as _pt
    with _pt.raises(ValueError, match="no retained snapshot"):
        t.read_as_of(at1 - 3600.0)
    # a reloaded handle sees the same retained log (atomic metadata)
    re = load_table(spark, str(tmp_path / "t"))
    assert re.read_version(0).count() == 4
    # a fourth commit expires v0 under retain_snapshots=3
    re.merge_into(
        spark.createDataFrame([("u7", None, "de", 77)], DDL), ["url"]
    )                                               # v3: u7 inserted (7 rows)
    with _pt.raises(ValueError, match="not retained"):
        re.read_version(0)
    assert re.read_version(1).count() == 5
    # vacuum(retain_last=2) keeps v2+v3; v1 expires; read_previous still
    # works against v2
    re.vacuum(retain_last=2)
    with _pt.raises(ValueError, match="not retained"):
        re.read_version(1)
    assert re.read_previous().count() == 6
    assert re.read_version(3).count() == 7
    # full vacuum: only the current version remains
    re.vacuum()
    with _pt.raises(ValueError, match="no previous snapshot"):
        re.read_previous()
    leftover = {
        e for e in os.listdir(str(tmp_path / "t"))
        if e.startswith("data-")
    }
    assert leftover == {re._data_name}


def test_merge_into_match_condition_latest_wins(spark, tmp_path):
    """Round-6 conditional MERGE (Iceberg WHEN MATCHED AND <cond>): a
    newer-event-time source row replaces the target, a STALE source row
    is a matched no-op (kept target, dropped source), and re-merging an
    already-applied batch is the identity — the reference sink's
    tags+time upsert idempotence (db_connector.py:53-66)."""
    t = create_table(spark, str(tmp_path / "t"), DDL, partition_by=["lang"])
    t.append(_rows(spark, 4))  # u0..u3, n = 0..3
    cond = "struct(s.n) >= struct(t.n)"

    # newer (bigger n) wins; u9 is an insert
    fresh = spark.createDataFrame(
        [("u2", None, "en", 202), ("u9", None, "de", 9)], DDL
    )
    t.merge_into(fresh, ["url"], match_condition=cond)
    got = {r["url"]: r["n"] for r in t.read().collect()}
    assert got == {"u0": 0, "u1": 1, "u2": 202, "u3": 3, "u9": 9}

    # stale (smaller n) is a matched no-op: target kept, source dropped
    stale = spark.createDataFrame([("u2", None, "en", 7)], DDL)
    t.merge_into(stale, ["url"], match_condition=cond)
    got = {r["url"]: r["n"] for r in t.read().collect()}
    assert got["u2"] == 202 and len(got) == 5

    # replay idempotence: re-merging an applied batch changes nothing
    t.merge_into(fresh, ["url"], match_condition=cond)
    assert {r["url"]: r["n"] for r in t.read().collect()} == got
    assert t.changelog().count() == 0  # identical rows cancel out

    # conditional delete: only rows the condition dooms leave
    t.merge_into(
        spark.createDataFrame([("u2", None, "en", 100)], DDL),
        ["url"],
        when_matched="delete",
        match_condition="t.n <= s.n",  # 202 > 100 → spared
    )
    assert {r["url"] for r in t.read().collect()} == {
        "u0", "u1", "u2", "u3", "u9"
    }
    t.merge_into(
        spark.createDataFrame([("u2", None, "en", 300)], DDL),
        ["url"],
        when_matched="delete",
        match_condition="t.n <= s.n",  # 202 <= 300 → deleted
    )
    assert {r["url"] for r in t.read().collect()} == {
        "u0", "u1", "u3", "u9"
    }


def test_merge_into_null_condition_does_not_duplicate(spark, tmp_path):
    """ADVICE r06: a match_condition that evaluates NULL for a matched
    pair (nullable order column) must behave as 'clause did not fire' —
    target kept, source consumed WITHOUT inserting. The old winners-side
    `~cond` anti-join kept the source on NULL, duplicating the key."""
    t = create_table(spark, str(tmp_path / "t"), DDL)
    t.append(_rows(spark, 3))  # u0..u2, n = 0..2
    cond = "t.n <= s.n"

    # s.n NULL -> cond NULL for the matched pair u1
    null_src = spark.createDataFrame([("u1", None, "en", None)], DDL)
    t.merge_into(null_src, ["url"], match_condition=cond)
    rows = t.read().collect()
    urls = [r["url"] for r in rows]
    assert sorted(urls) == ["u0", "u1", "u2"]  # no duplicate key
    got = {r["url"]: r["n"] for r in rows}
    assert got["u1"] == 1  # target kept, NULL-source dropped

    # an unmatched source row with NULL n still inserts (no key match,
    # the condition never evaluates)
    new_src = spark.createDataFrame([("u7", None, "de", None)], DDL)
    t.merge_into(new_src, ["url"], match_condition=cond)
    got = {r["url"]: r["n"] for r in t.read().collect()}
    assert set(got) == {"u0", "u1", "u2", "u7"} and got["u7"] is None


def test_changelog_between_arbitrary_versions(spark, tmp_path):
    """Round-6 incremental CDC: changelog(from, to) over any two retained
    versions nets the whole range — an upsert-then-delete inside the
    range cancels out; the range feed equals the sum of the per-step
    feeds; expired versions raise."""
    import pytest as _pytest

    t = create_table(
        spark, str(tmp_path / "t"), DDL, partition_by=["lang"],
        retain_snapshots=4,
    )
    t.append(_rows(spark, 3))                                # v? base: u0,u1,u2
    v0 = t.snapshots[-1]["version"]
    up = spark.createDataFrame([("u1", None, "en", 101), ("u9", None, "de", 9)], DDL)
    t.merge_into(up, ["url"])                                # v1: u1→101, +u9
    v1 = t.snapshots[-1]["version"]
    t.merge_into(
        spark.createDataFrame([("u9", None, "de", 0)], DDL),
        ["url"], when_matched="delete",
    )                                                        # v2: -u9
    v2 = t.snapshots[-1]["version"]

    # net range v0→v2: u1 replaced; u9 inserted+deleted cancels out
    net = {(r["url"], r["n"]): r["_change"]
           for r in t.changelog(v0, v2).collect()}
    assert net == {("u1", 1): -1, ("u1", 101): 1}

    # range feed == sum of per-step feeds
    step1 = {(r["url"], r["n"]): r["_change"]
             for r in t.changelog(v0, v1).collect()}
    step2 = {(r["url"], r["n"]): r["_change"]
             for r in t.changelog(v1, v2).collect()}
    summed = dict(step1)
    for k, w in step2.items():
        summed[k] = summed.get(k, 0) + w
    assert {k: w for k, w in summed.items() if w != 0} == net

    # default args still mean previous→current
    assert {(r["url"], r["n"]): r["_change"]
            for r in t.changelog().collect()} == step2

    # reversed range is the negation
    rev = {(r["url"], r["n"]): r["_change"]
           for r in t.changelog(v2, v0).collect()}
    assert rev == {k: -w for k, w in net.items()}

    # unknown version raises, never substitutes
    with _pytest.raises(ValueError, match="not retained"):
        t.changelog(999, v2).collect()


def test_merge_update_exprs_arithmetic_upsert(spark, tmp_path):
    """WHEN MATCHED THEN UPDATE SET: matched keys apply the per-column
    t/s expressions (unlisted columns keep the target value), unmatched
    source rows insert as-is; keys and unknown columns are rejected and
    a type-changing expression fails loud."""
    t = create_table(spark, str(tmp_path / "t"), DDL, partition_by=["lang"])
    t.append(_rows(spark, 4))  # u0..u3, n=0..3
    src = spark.createDataFrame(
        [
            ("u1", None, "IGNORED", 100),  # matched: n adds, lang kept
            ("u7", None, "en", 700),       # unmatched: inserts verbatim
        ],
        DDL,
    )
    t.merge_into(src, ["url"], update_exprs={"n": "t.n + s.n"})
    got = {r["url"]: (r["lang"], r["n"]) for r in t.read().collect()}
    assert got == {
        "u0": ("en", 0), "u2": ("en", 2), "u3": ("de", 3),
        "u1": ("de", 101),       # 1 + 100, lang NOT replaced
        "u7": ("en", 700),
    }
    with pytest.raises(ValueError, match="cannot be updated"):
        t.merge_into(src, ["url"], update_exprs={"url": "s.url"})
    with pytest.raises(ValueError, match="not a table column"):
        t.merge_into(src, ["url"], update_exprs={"bogus": "1"})
    with pytest.raises(ValueError, match="column types"):
        t.merge_into(src, ["url"], update_exprs={"n": "t.n + 0.5"})
    with pytest.raises(ValueError, match="requires when_matched"):
        t.merge_into(
            src, ["url"], when_matched="delete", update_exprs={"n": "t.n"}
        )


def test_merge_update_exprs_with_condition(spark, tmp_path):
    """match_condition composes with update_exprs: matched rows failing
    the condition stay untouched and their source rows drop."""
    t = create_table(spark, str(tmp_path / "t"), DDL)
    t.append(_rows(spark, 3))  # n = 0,1,2
    src = spark.createDataFrame(
        [("u1", None, "en", 10), ("u2", None, "en", -10)], DDL
    )
    t.merge_into(
        src, ["url"],
        match_condition="s.n > 0",
        update_exprs={"n": "t.n + s.n"},
    )
    got = {r["url"]: r["n"] for r in t.read().collect()}
    assert got == {"u0": 0, "u1": 11, "u2": 2}


def test_incremental_rollup_from_changelog(spark, tmp_path):
    """O(delta) materialized-rollup maintenance: a per-lang (cnt, total)
    rollup kept in a second table via changelog + arithmetic MERGE
    equals a full recompute from the final base snapshot after every
    commit — inserts, updates and deletes included."""
    base = create_table(
        spark, str(tmp_path / "b"), DDL, partition_by=["lang"]
    )
    base.append(_rows(spark, 8))  # v0 (first commit is version 0)
    agg_ddl = "lang string, cnt bigint, total bigint"
    agg = create_table(spark, str(tmp_path / "a"), agg_ddl)
    agg.append(
        base.read().groupBy("lang").agg(
            F.count(F.lit(1)).alias("cnt"), F.sum("n").alias("total")
        )
    )

    def maintain(from_v, to_v):
        delta = (
            base.changelog(from_v, to_v)
            .groupBy("lang")
            .agg(
                F.sum("_change").alias("cnt"),
                F.sum(F.col("n") * F.col("_change")).alias("total"),
            )
        )
        agg.merge_into(
            delta, ["lang"],
            update_exprs={
                "cnt": "t.cnt + s.cnt", "total": "t.total + s.total"
            },
        )

    def recomputed():
        return {
            r["lang"]: (r["cnt"], r["total"])
            for r in base.read().groupBy("lang").agg(
                F.count(F.lit(1)).alias("cnt"), F.sum("n").alias("total")
            ).collect()
        }

    def materialized():
        return {
            r["lang"]: (r["cnt"], r["total"])
            for r in agg.read().filter(F.col("cnt") != 0).collect()
        }

    # commit 1: upsert (u1 grows, u20 arrives in a NEW lang value)
    base.merge_into(
        spark.createDataFrame(
            [("u1", None, "de", 500), ("u20", None, "fr", 20)], DDL
        ),
        ["url"],
    )
    maintain(0, 1)
    assert materialized() == recomputed()
    # commit 2: delete all of lang fr -> its rollup row nets to cnt 0
    base.merge_into(
        spark.createDataFrame([("u20", None, "fr", 0)], DDL),
        ["url"], when_matched="delete",
    )
    maintain(1, 2)
    assert materialized() == recomputed()
    assert {
        r["lang"]: r["cnt"] for r in agg.read().collect()
    }["fr"] == 0  # netted out, sweepable by a delete-merge


def test_rewrite_clustered_prunes_range_scans(spark, tmp_path):
    """Sort-order rewrite + footer-stats data skipping: after
    clustering on n, a narrow range scan OPENS only the overlapping
    files and returns exactly what a full-scan filter returns."""
    ddl = "url string, warc_ts timestamp_ntz, lang string, n bigint"
    t = create_table(spark, str(tmp_path / "t"), ddl)
    rows = spark.createDataFrame(
        [(f"u{i}", None, ["en", "de"][i % 2], (i * 7919) % 10000)
         for i in range(5000)],
        ddl,
    )
    t.append(rows)
    nfiles = t.rewrite_clustered(["n"], target_files=8)
    assert nfiles == 8
    # every file now has a usable envelope
    stats = t.file_column_stats("n")
    assert all(mn is not None and mx is not None for _, mn, mx in stats)
    kept = t.files_between("n", 100, 200)
    assert 0 < len(kept) < nfiles  # genuinely pruned
    got = sorted(r["url"] for r in t.read_between("n", 100, 200).collect())
    want = sorted(
        r["url"]
        for r in t.read().filter(F.col("n").between(100, 200)).collect()
    )
    assert got == want and len(got) > 0
    # empty range -> zero files opened, empty result, schema intact
    assert t.files_between("n", 100000, 200000) == []
    assert t.read_between("n", 100000, 200000).count() == 0


def test_read_between_fail_open_on_unclustered(spark, tmp_path):
    """Without clustering the envelopes straddle the range: pruning may
    keep everything, but results are still exact (fail open)."""
    ddl = "url string, warc_ts timestamp_ntz, lang string, n bigint"
    t = create_table(spark, str(tmp_path / "t"), ddl, partition_by=["lang"])
    t.append(_rows(spark, 200))
    got = sorted(r["n"] for r in t.read_between("n", 10, 20).collect())
    assert got == list(range(10, 21))
    with pytest.raises(ValueError, match="partition column"):
        t.files_between("lang", "a", "z")
