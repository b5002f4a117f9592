#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Per-query timing = full action (plan + execute + collect-to-count). A
throughput figure for the flagship pairwise join is included under
"extra" (joined rows / sec), plus the two-parallelism scaling numbers when
SPARK_GRAFT_SCALING=1 (see scripts/bench_scaling.py for the standalone run).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline set: engine-core operators over the sf tables
HEADLINE = [
    "nn_pair_join",
    "nn_pair_join_delta",
    "asof_backward",
    "tumbling_hourly",
    "sliding_1h_15m",
    "session_30m",
    "unpivot_lineitem",
    "dedup_exact",
]


def main() -> None:
    import __spark_entry__ as entry_mod
    from statefulstreamprocessor_spark.session import get_spark

    spark = get_spark("ssp-bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    # warm the JVM + parquet footers once with a trivial action
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        n = fn(spark, SF_DIR).count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        if name == "nn_pair_join":
            extra["nn_pair_join_rows"] = n
            extra["nn_join_rows_per_sec"] = round(n / dt, 1)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_query_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "extra": extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
