#!/usr/bin/env python3
"""Profile ngram_jaccard's per-run anatomy at sf0.1 (optimization guide §1).

Splits the bench-observed per-run cost into: plan construction (driver),
scan+tokenize+gram explode (noop), + each subsequent exchange stage, and
the full query. REPS passes, min kept, after a sf0.001 warmup.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "3"))


def main() -> None:
    import __spark_entry__ as entry_mod
    from statefulstreamprocessor_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("prof-ngram", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    qs["ngram_jaccard"](spark, "/root/testdata/sf0.001").count()

    timings: dict[str, float] = {}

    def t(label, fn):
        t0 = time.perf_counter()
        r = fn()
        dt = time.perf_counter() - t0
        if label not in timings or dt < timings[label]:
            timings[label] = round(dt, 3)
        return r

    from statefulstreamprocessor_spark.operators.dedup import ngram_jaccard_pairs

    for _ in range(REPS):
        # 1. plan construction only
        t("plan_build", lambda: qs["ngram_jaccard"](spark, SF_DIR))
        # 2. full query via count (bench methodology)
        t("full_count", lambda: qs["ngram_jaccard"](spark, SF_DIR).count())
        # 3. full query, reused plan (second count on same DataFrame)
        df = qs["ngram_jaccard"](spark, SF_DIR)
        df.count()
        t("recount_same_df", lambda: df.count())
        # 4. stage isolation
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
            F.col("text").isNotNull()
        )
        n = 3
        docs32 = docs.repartition(32)
        toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        L = F.greatest(F.size(toks) - (n - 1), F.lit(1))
        zips = F.arrays_zip(*[F.slice(toks, i + 1, L) for i in range(n)])
        dz = F.array_distinct(zips)
        g = docs32.select(F.col("doc_id").alias("id"), dz.alias("__dz")).select(
            "id", F.size("__dz").alias("n_grams"), F.explode_outer("__dz").alias("__gs")
        ).select("id", "n_grams", F.xxhash64("__gs").alias("gram"))
        t("gram_stage_noop", lambda: g.write.format("noop").mode("overwrite").save())
        grouped = g.groupBy("gram").agg(
            F.collect_list(F.struct(F.col("id"), F.col("n_grams"))).alias("ds")
        ).filter((F.size("ds") <= 50) & (F.size("ds") >= 2))
        t("grouped_noop", lambda: grouped.write.format("noop").mode("overwrite").save())
        pairs = (
            grouped.select("ds", F.explode("ds").alias("a"))
            .select("a", F.explode("ds").alias("b"))
            .filter(F.col("a.id") < F.col("b.id"))
        )
        inter = pairs.groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.n_grams").alias("na"), F.col("b.n_grams").alias("nb"),
        ).agg(F.count(F.lit(1)).alias("n_inter"))
        t("inter_noop", lambda: inter.write.format("noop").mode("overwrite").save())
        # 5. operator without the entry wrapper, no observe
        t("op_no_observe_count", lambda: inter.select(
            "id_a", "id_b",
            F.round(F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 6).alias("jaccard"),
        ).filter(F.col("jaccard") >= 0.2).count())
        # 6. operator as shipped (with observe), direct call
        t("op_shipped_count", lambda: ngram_jaccard_pairs(
            docs, "text", "doc_id", n=3, threshold=0.2, max_df=50,
            min_input_partitions=32,
        ).count())

    import json
    print(json.dumps(timings, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
