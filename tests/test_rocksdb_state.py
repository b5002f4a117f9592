"""RocksDB state store: the north-rule checkpoint backend.

The custom stateful operators must run — and KILL-AND-RESUME — under
``RocksDBStateStoreProvider`` exactly as under the default HDFS-backed
store (the provider is an exchangeable persistence layer below
applyInPandasWithState; these tests pin that the engine's state
round-trips survive the swap). The provider class is read per QUERY
start, so it is set around each streaming run and restored after —
other test modules sharing the JVM keep the default store.
"""

from __future__ import annotations

import datetime
import glob
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from statefulstreamprocessor_spark.streaming.sessionize import (
    streaming_sessionize,
)

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


@pytest.fixture(scope="module")
def spark():
    from statefulstreamprocessor_spark.session import get_spark

    return get_spark("rocksdb-tests", master="local[4]", shuffle_partitions=8)


@pytest.fixture()
def rocksdb(spark):
    had = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
    yield
    if had is None:
        spark.conf.unset(_PROVIDER_KEY)
    else:
        spark.conf.set(_PROVIDER_KEY, had)


def _mkdata(n_users=5, per_user=30):
    t0 = datetime.datetime(2024, 7, 1)
    rows = []
    eid = 0
    for u in range(n_users):
        for j in range(per_user):
            # ragged gaps so several sessions per user form
            rows.append(
                (u, t0 + datetime.timedelta(seconds=j * j * 37 + u), eid)
            )
            eid += 1
    return pd.DataFrame(rows, columns=["user_id", "ts", "event_id"])


def _write_chunks(in_dir, pdf, n_files):
    os.makedirs(in_dir, exist_ok=True)
    s = pdf.sort_values("ts", kind="mergesort").reset_index(drop=True)
    step = (len(s) + n_files - 1) // n_files
    for i in range(n_files):
        c = s.iloc[i * step : (i + 1) * step]
        if len(c):
            c.to_parquet(
                os.path.join(in_dir, f"part-{i:03d}.parquet"),
                index=False, coerce_timestamps="us",
            )
    flush = pd.DataFrame(
        {
            "user_id": [-1],
            "ts": [s["ts"].max() + pd.Timedelta(hours=4)],
            "event_id": [-1],
        }
    )
    flush.to_parquet(
        os.path.join(in_dir, "part-zz-flush.parquet"),
        index=False, coerce_timestamps="us",
    )


def _run(spark, in_dir, out_dir, ck):
    raw = (
        spark.readStream.schema(
            "user_id bigint, ts timestamp_ntz, event_id bigint"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    stream = raw.select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id"
    ).withWatermark("ts", "0 seconds")
    out = streaming_sessionize(
        stream, ["user_id"], "ts", "event_id", gap_seconds=600.0,
        n_buckets=8,
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).filter(F.col("user_id") >= 0)


def _batch_expected(spark, pdf):
    from statefulstreamprocessor_spark.operators.sessions import sessionize

    df = spark.createDataFrame(
        pdf, "user_id long, ts timestamp_ntz, event_id long"
    )
    return {
        (r["key"], r["id"]): r["session_idx"]
        for r in sessionize(
            df, "user_id", "ts", "event_id", gap_seconds=600.0
        ).collect()
    }


def test_rocksdb_resume_equals_batch(spark, tmp_path, rocksdb):
    """Kill after half the input under RocksDB, resume from the same
    checkpoint: the union equals the batch sessionize row-for-row (no
    duplicates, no gaps), and the checkpoint holds genuine RocksDB
    artifacts (SST files), proving the provider actually engaged."""
    pdf = _mkdata()
    full_in = str(tmp_path / "full")
    _write_chunks(full_in, pdf, n_files=6)
    half_in = str(tmp_path / "half")
    os.makedirs(half_in)
    for p in sorted(glob.glob(os.path.join(full_in, "part-0*.parquet")))[:3]:
        os.link(p, os.path.join(half_in, os.path.basename(p)))
    out_dir, ck = str(tmp_path / "o"), str(tmp_path / "ck")
    _run(spark, half_in, out_dir, ck)
    for p in glob.glob(os.path.join(full_in, "*.parquet")):
        dst = os.path.join(half_in, os.path.basename(p))
        if not os.path.exists(dst):
            os.link(p, dst)
    out = _run(spark, half_in, out_dir, ck)
    got = {
        (r["user_id"], r["event_id"]): r["session_idx"]
        for r in out.collect()
    }
    assert got == _batch_expected(spark, pdf)
    ssts = glob.glob(os.path.join(ck, "state", "**", "*.sst"), recursive=True)
    assert ssts, "no RocksDB SST files in the checkpoint state dir"


def test_rocksdb_checkpoint_not_resumable_under_default_store(
    spark, tmp_path
):
    """Sanity inverse: a run WITHOUT the rocksdb fixture uses the default
    HDFS-backed store and its checkpoint contains .delta state files,
    not SSTs — pinning that the previous test's SST assertion really
    distinguishes the providers."""
    pdf = _mkdata(n_users=2, per_user=10)
    in_dir = str(tmp_path / "in")
    _write_chunks(in_dir, pdf, n_files=2)
    _run(spark, in_dir, str(tmp_path / "o"), str(tmp_path / "ck"))
    state = os.path.join(str(tmp_path / "ck"), "state")
    assert not glob.glob(os.path.join(state, "**", "*.sst"), recursive=True)
    assert glob.glob(os.path.join(state, "**", "*.delta"), recursive=True)
