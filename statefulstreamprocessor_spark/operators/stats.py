"""Per-group trend (least-squares slope) with exact cross-engine math.

``regr_slope``-style aggregates are order-dependent floating-point sums —
two engines (or two partitionings of the same engine) can disagree in the
last ulps. This operator instead accumulates EXACT integers: x is
seconds-from-group-start (small), y is micro-units (``round(y·1e6)``),
and every Σ runs in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — the
closed-form slope ``(nΣxy − ΣxΣy) / (nΣx² − (Σx)²)`` is then one
correctly-rounded double division at the end. Partition-order-independent
and engine-portable by construction — the same discipline as the exact
DECIMAL money sums in the windowed aggregations.

Physical shape: the per-group ``min(x)`` window and the final aggregation
share one hash exchange on the key (the window's HashPartitioning
satisfies the aggregation's ClusteredDistribution); map-side partial
aggregation applies. O(n) total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_trend(
    df: DataFrame, key_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """Least-squares slope of value-per-second for each series, exactly.

    Output: ``key`` | ``n`` | ``slope`` (units/second, 6 dp, NULL-free —
    groups with a degenerate x variance are dropped).
    """
    from statefulstreamprocessor_spark.operators.resample import _epoch

    obs = df.select(
        F.col(key_col).alias("key"),
        _epoch(F.col(ts_col)).alias("x0"),
        F.round(F.col(value_col) * 1e6).cast("bigint").alias("yi"),
    )
    w = Window.partitionBy("key")
    centered = obs.select(
        "key",
        (F.col("x0") - F.min("x0").over(w)).alias("xs"),
        "yi",
    )
    d = "decimal(38,0)"
    agg = centered.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("xs").cast(d)).alias("sx"),
        F.sum(F.col("yi").cast(d)).alias("sy"),
        # cast the OPERANDS, not the product: xs·yi in BIGINT overflows
        # int64 for long series with large values (xs ~ 3e7 s, |y| ~ 3e5
        # micro-units) — ANSI-mode runtime error or silently wrong slopes.
        # DECIMAL(38,0) × DECIMAL(38,0) mirrors the oracle's
        # CAST(xs AS HUGEINT) * yi.
        F.sum(F.col("xs").cast(d) * F.col("yi").cast(d)).alias("sxy"),
        F.sum(F.col("xs").cast(d) * F.col("xs").cast(d)).alias("sxx"),
    )
    num = F.col("n").cast(d) * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n").cast(d) * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        agg.filter(den > 0)
        .select(
            "key",
            "n",
            (
                F.round(
                    num.cast("double") / den.cast("double") / F.lit(1e6), 6
                )
                + F.lit(0.0)  # collapse IEEE negative zero
            ).alias("slope"),
        )
    )
