#!/usr/bin/env python3
"""spark-submit entrypoint for the webtext streaming pipeline.

Cluster deploy:

    python -c "from statefulstreamprocessor_spark.shipping import \
        build_package_zip; print(build_package_zip())"   # -> ssp_spark.zip
    spark-submit --py-files ssp_spark.zip \
        --conf spark.sql.streaming.stateStore.providerClass=\
org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider \
        scripts/run_pipeline.py \
        --input /data/webtext --output /data/joined \
        --watermark "30 seconds" --delta 3600 --continuous

In this sandbox the same entrypoint runs on local[N] (availableNow).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--watermark", default="0 seconds")
    ap.add_argument("--delta", type=float, default=None)
    ap.add_argument("--max-files-per-trigger", type=int, default=4)
    ap.add_argument("--continuous", action="store_true",
                    help="processingTime trigger instead of availableNow")
    ap.add_argument("--lineage", default=None, help="lineage JSONL path")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from statefulstreamprocessor_spark.streaming.lineage import LineageListener
    from statefulstreamprocessor_spark.streaming.pipeline import (
        build_webtext_join,
        read_webtext_stream,
    )
    from statefulstreamprocessor_spark.streaming.sink import IdempotentBatchSink

    spark = SparkSession.builder.appName("ssp-webtext-pipeline").getOrCreate()
    if args.lineage:
        spark.streams.addListener(LineageListener(args.lineage))

    raw = read_webtext_stream(spark, args.input, args.max_files_per_trigger)
    joined = build_webtext_join(raw, args.watermark, args.delta)
    sink = IdempotentBatchSink(args.output)
    writer = joined.writeStream.foreachBatch(sink).option(
        "checkpointLocation", os.path.join(args.output, "checkpoint")
    )
    if args.continuous:
        q = writer.trigger(processingTime="5 seconds").start()
    else:
        q = writer.trigger(availableNow=True).start()
    q.awaitTermination()


if __name__ == "__main__":
    main()
