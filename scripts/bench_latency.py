#!/usr/bin/env python3
"""Live event-time-to-emit latency bench.

Drives the streaming closure join from a live ``rate`` source (event time =
wall clock at generation), measures per-emitted-pair latency = sink wall
time − pair's later event time, and prints one JSON line with p50/p95.
This is the true "event-time-to-emit" percentile for a live stream — the
replay benches (bench.py) measure throughput instead, where historical
event times make this metric meaningless.

    python scripts/bench_latency.py [rows_per_sec] [duration_sec]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main(
    rows_per_sec: int = 5000, duration_sec: int = 40, in_order: bool = False
) -> None:
    from pyspark.sql import functions as F

    from statefulstreamprocessor_spark.session import get_spark
    from statefulstreamprocessor_spark.streaming.stateful_join import (
        streaming_nn_join,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("ssp-latency", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus), rocksdb_state=True)
    spark.sparkContext.setLogLevel("ERROR")

    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_sec
    ).load()
    stream = rate.select(
        # odd modulus: consecutive sweeps alternate each url's side
        F.concat(F.lit("url-"), (F.col("value") % 499).cast("string")).alias("url"),
        F.col("timestamp").alias("warc_ts"),
        F.when(F.col("value") % 2 == 0, "r").otherwise("s").alias("side"),
        (F.col("value") % 1000).cast("double").alias("payload"),
    ).withWatermark("warc_ts", "1 second")
    # the rate source is monotone per url, so assume_in_order is valid here:
    # decisions finalize on arrival instead of trailing the watermark batch.
    # n_buckets sizes to the BATCH, not the core count: at low rates each
    # extra state group adds a per-trigger Arrow + state-store round trip
    # (64 buckets measured p95 6.5 s vs 8 buckets 2.1 s at 2000 rows/s)
    joined = streaming_nn_join(
        stream, ["url"], "warc_ts", "side", n_buckets=8,
        assume_in_order=in_order,
    )

    lat_ms: list[float] = []

    def measure(batch_df, batch_id):
        rows = batch_df.select("r_warc_ts", "s_warc_ts").collect()
        now = time.time()
        for r in rows:
            later = max(r["r_warc_ts"], r["s_warc_ts"]).timestamp()
            lat_ms.append((now - later) * 1000.0)

    ck = tempfile.mkdtemp(prefix="ssp_lat_")
    q = (
        joined.writeStream.foreachBatch(measure)
        .option("checkpointLocation", ck)
        .trigger(processingTime="1 second")
        .start()
    )
    time.sleep(duration_sec)
    q.stop()
    spark.stop()
    arr = np.array(lat_ms)
    out = {
        "metric": "event_time_to_emit_latency",
        "mode": "in_order" if in_order else "watermark",
        "rows_per_sec": rows_per_sec,
        "duration_sec": duration_sec,
        "emitted_pairs": int(len(arr)),
        "p50_ms": round(float(np.percentile(arr, 50)), 1) if len(arr) else None,
        "p95_ms": round(float(np.percentile(arr, 95)), 1) if len(arr) else None,
        "p99_ms": round(float(np.percentile(arr, 99)), 1) if len(arr) else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 5000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 40,
        in_order="--in-order" in sys.argv,
    )
