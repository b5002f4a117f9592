"""Lineage listener: per-batch source offsets, watermark, metrics to JSONL."""

import json
import os
import time

from pyspark.sql import functions as F

from statefulstreamprocessor_spark.streaming.lineage import LineageListener


def test_lineage_listener_records_progress(spark, tmp_path):
    out = str(tmp_path / "lineage.jsonl")
    listener = LineageListener(out)
    spark.streams.addListener(listener)
    try:
        rate = spark.readStream.format("rate").option("rowsPerSecond", 100).load()
        q = (
            rate.select("value")
            .writeStream.format("memory")
            .queryName("lineage_probe")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(processingTime="1 second")
            .start()
        )
        deadline = time.time() + 30
        while time.time() < deadline:
            if os.path.exists(out) and sum(
                1 for l in open(out) if '"progress"' in l
            ) >= 2:
                break
            time.sleep(1)
        q.stop()
    finally:
        spark.streams.removeListener(listener)
    recs = [json.loads(l) for l in open(out)]
    kinds = {r["event"] for r in recs}
    assert "started" in kinds and "progress" in kinds
    prog = [r for r in recs if r["event"] == "progress"][-1]
    assert prog["sources"] and "start_offset" in prog["sources"][0]
    assert prog["num_input_rows"] >= 0
