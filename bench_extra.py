#!/usr/bin/env python3
"""Extra benchmarks for the optimization round (bench.py is FROZEN).

Per-query isolation per the optimization guide §1:
  * times each headline query exactly like bench.py (``.count()``, min of
    N passes after a sf0.001 warmup pass), plus an optional noop-sink
    timing (computes every column, guide §1.4);
  * writes ``.explain("formatted")`` for each query to plans/r07/;
  * labels jobs with setJobDescription.

Usage:
  python bench_extra.py [query ...]            # default: all headline
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py ann_cosine_topk
  PLANS_SUFFIX=after python bench_extra.py     # plans/r07/<q>_after.txt
  NOOP=1 python bench_extra.py                 # also time the noop sink
  REPS=3 python bench_extra.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("REPS", "2"))
NOOP = os.environ.get("NOOP", "0") == "1"
SUFFIX = os.environ.get("PLANS_SUFFIX", "before")
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r07")

HEADLINE = [
    "nn_pair_join",
    "nn_pair_join_delta",
    "asof_backward",
    "tumbling_hourly",
    "sliding_1h_15m",
    "session_30m",
    "unpivot_lineitem",
    "dedup_exact",
    "ngram_jaccard",
    "ann_cosine_topk",
    "text_quality",
    "salted_agg",
    "windowed_latest_pair",
]


def main() -> None:
    import __spark_entry__ as entry_mod
    from statefulstreamprocessor_spark.session import get_spark

    names = sys.argv[1:] or HEADLINE
    spark = get_spark("ssp-bench-extra", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    os.makedirs(PLAN_DIR, exist_ok=True)
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()  # warm
    spark.range(64_000).repartition(CPUS).mapInPandas(
        lambda it: it, "id long"
    ).count()
    for name in names:
        qs[name](spark, "/root/testdata/sf0.001").count()  # steady-state warmup

    timings: dict[str, float] = {}
    noop_timings: dict[str, float] = {}
    for _ in range(REPS):
        for name in names:
            fn = qs[name]
            spark.sparkContext.setJobDescription(f"{name} [count]")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            dt = time.perf_counter() - t0
            if name not in timings or dt < timings[name]:
                timings[name] = round(dt, 3)
            if NOOP:
                spark.sparkContext.setJobDescription(f"{name} [noop]")
                df = fn(spark, SF_DIR)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                if name not in noop_timings or dt < noop_timings[name]:
                    noop_timings[name] = round(dt, 3)
            spark.sparkContext.setJobDescription(None)

    for name in names:
        with open(os.path.join(PLAN_DIR, f"{name}_{SUFFIX}.txt"), "w") as fh:
            fh.write(qs[name](spark, SF_DIR)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            ))

    out = {
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "reps": REPS,
        "queries": timings,
        "total": round(sum(timings.values()), 3),
    }
    if NOOP:
        out["queries_noop"] = noop_timings
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
