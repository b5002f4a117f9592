#!/usr/bin/env python3
"""Dump .explain("formatted") for the given headline queries to
plans/r07/<q>_<SUFFIX>.txt (plan-only; no timed execution)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SUFFIX = os.environ.get("PLANS_SUFFIX", "after")
PLAN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r07"
)


def main() -> None:
    import __spark_entry__ as entry_mod
    from statefulstreamprocessor_spark.session import get_spark

    spark = get_spark("dump-plans", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    os.makedirs(PLAN_DIR, exist_ok=True)
    for name in sys.argv[1:]:
        df = qs[name](spark, SF_DIR)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(PLAN_DIR, f"{name}_{SUFFIX}.txt"), "w") as fh:
            fh.write(txt)
        print("wrote", name)
    spark.stop()


if __name__ == "__main__":
    main()
