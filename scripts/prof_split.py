#!/usr/bin/env python3
"""Split every headline query's bench cost into plan construction vs
execution (guide §1.2 step 2): plan build = calling the query fn; execution
= .count() on an already-built DataFrame. REPS passes, min kept, bench-like
context (all queries in sequence after sf0.001 warmup)."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "3"))

HEADLINE = [
    "nn_pair_join", "nn_pair_join_delta", "asof_backward", "tumbling_hourly",
    "sliding_1h_15m", "session_30m", "unpivot_lineitem", "dedup_exact",
    "ngram_jaccard", "ann_cosine_topk", "text_quality", "salted_agg",
    "windowed_latest_pair",
]


def main() -> None:
    import __spark_entry__ as entry_mod
    from statefulstreamprocessor_spark.session import get_spark

    spark = get_spark("prof-split", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    spark.range(64_000).repartition(32).mapInPandas(lambda it: it, "id long").count()
    for name in HEADLINE:
        qs[name](spark, "/root/testdata/sf0.001").count()

    build: dict[str, float] = {}
    execu: dict[str, float] = {}
    for _ in range(REPS):
        for name in HEADLINE:
            fn = qs[name]
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            dt = time.perf_counter() - t0
            if name not in build or dt < build[name]:
                build[name] = round(dt, 3)
            t0 = time.perf_counter()
            df.count()
            dt = time.perf_counter() - t0
            if name not in execu or dt < execu[name]:
                execu[name] = round(dt, 3)
    out = {
        "build": build,
        "exec": execu,
        "build_total": round(sum(build.values()), 3),
        "exec_total": round(sum(execu.values()), 3),
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
