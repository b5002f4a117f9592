"""Distributed prefix sum + token-budget sequence packing.

Building LLM training shards means walking the corpus in a canonical
order and cutting it into contiguous chunks of ~B tokens. The walk is a
global running sum — the textbook anti-pattern if written as one
``Window.orderBy(...)`` (a single-partition sort of the whole corpus).
Here it is the classic two-level scan instead:

1. bucket the rows by a range function of the (numeric) order key,
2. aggregate one partial sum per bucket (tiny — one row per bucket),
3. turn the partials into per-bucket starting offsets with a window over
   the BUCKET TOTALS (thousands of rows, not the corpus),
4. broadcast-join the offsets back and add the within-bucket running sum
   (one hash exchange on the bucket key, O(n) running frame).

No driver collect, no global sort, no Python; every step is Catalyst.
The result is identical to ``sum(v) OVER (ORDER BY order_col)`` — the
oracle form — for any bucket width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    bucket_width: int,
    out_col: str = "cum",
) -> DataFrame:
    """Inclusive global running sum of ``value_col`` in ``order_col`` order.

    ``order_col`` must be numeric with distinct values (a doc/row id);
    ``bucket_width`` sets the range-bucket size — size it so a bucket's
    rows fit one task comfortably (e.g. 1e6 ids per bucket at corpus
    scale). Correctness does not depend on the width.
    """
    b = (F.col(order_col) / F.lit(bucket_width)).cast("bigint").alias("__b")
    rows = df.withColumn("__b", b)
    partials = rows.groupBy("__b").agg(
        F.sum(F.col(value_col)).alias("__bsum")
    )
    # offsets: exclusive prefix over the bucket totals — this window runs
    # over one row per bucket, not over the data
    off_w = (
        Window.orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = partials.select(
        "__b",
        (F.sum("__bsum").over(off_w) - F.col("__bsum")).alias("__off"),
    )
    in_w = (
        Window.partitionBy("__b")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rows.join(F.broadcast(offsets), "__b")
        .withColumn(
            out_col, F.col("__off") + F.sum(F.col(value_col)).over(in_w)
        )
        .drop("__b", "__off")
    )


def pack_by_token_budget(
    df: DataFrame,
    order_col: str,
    tokens_col: str,
    budget: int,
    bucket_width: int,
    shard_col: str = "shard_id",
) -> DataFrame:
    """Assign each document to a training shard of ~``budget`` tokens.

    Documents are walked in ``order_col`` order; a document starts in the
    shard its cumulative start offset falls into
    (``shard = floor(prev_cum / budget)``) — contiguous shards, each
    filled to the budget boundary (a document may straddle one).
    Adds ``cum_tokens`` (inclusive running total) and ``shard_col``.
    """
    out = global_cumsum(
        df, order_col, tokens_col, bucket_width, out_col="cum_tokens"
    )
    return out.withColumn(
        shard_col,
        ((F.col("cum_tokens") - F.col(tokens_col)) / F.lit(budget)).cast(
            "bigint"
        ),
    )
