"""Distributed frequent-items (heavy hitters) with exact verification.

The streaming-sketch classic, shaped for a shuffle engine: finding every
value with frequency > num/den of the corpus does NOT need a full
``groupBy(value)`` of the data. Phase 1 runs a per-Arrow-batch frequent
filter (the mergeable Misra-Gries / lossy-counting bound): a value is a
*candidate* iff some batch contains it more than ``n_batch · num/den``
times. If a value fails that in EVERY batch, summing the per-batch
inequalities gives ``count · den ≤ n · num`` — so the candidate set is a
guaranteed superset of the true heavy hitters, and it is small by
construction (at most ``den/num`` survivors per batch). Phase 2 exactly
recounts ONLY the candidates with a broadcast semi-join and keeps
``count · den > n · num``.

All threshold math is integer (``num``/``den`` rationals, never a float
``fraction · n``), so the output is bit-identical to a plain
``GROUP BY ... HAVING count·den > n·num`` in any engine — the oracle —
while the corpus-sized shuffle a full group-by would take is replaced by
a broadcast semi-join plus an aggregation over candidate rows only.

At 100 TB: phase 1 is map-side only (one pandas ``value_counts`` per
Arrow batch, no Python loops); the candidate set is bounded by
``batches × den/num`` ids and broadcasts; the only data-sized exchange
is the pre-filtered recount, which map-side partial aggregation reduces
to ≤ partitions × |candidates| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["frequent_items"]


def frequent_items(
    df: DataFrame,
    col: str,
    num: int = 1,
    den: int = 100,
    n_total: int | None = None,
) -> DataFrame:
    """Every value of ``col`` occurring in MORE than ``num/den`` of the
    rows, with its exact count.

    Output: ``value`` | ``cnt`` | ``n_total`` (the corpus row count, so
    the fraction is reconstructible downstream).

    ``n_total``: optional known non-NULL row count. Without it the total
    comes from a third scan of the input (candidates, recount, count);
    callers at scale that know their table stats pass it and pay two
    scans — the same hint discipline as ``train_ivf_centroids(n_rows=)``.
    """
    if num <= 0 or den <= 0 or num >= den:
        raise ValueError("need 0 < num/den < 1")
    vals = df.select(F.col(col).alias("value")).filter(
        F.col("value").isNotNull()
    )

    def batch_frequent(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            counts = pdf["value"].value_counts()
            # integer threshold: cnt * den > n_batch * num
            keep = counts[counts * den > len(pdf) * num]
            if len(keep):
                yield keep.rename_axis("value").reset_index(name="__c")[
                    ["value"]
                ]

    candidates = (
        vals.mapInPandas(batch_frequent, "value " + dict(vals.dtypes)["value"])
        .distinct()
    )
    if n_total is not None:
        n_total_df = df.sparkSession.range(1).select(
            F.lit(int(n_total)).cast("bigint").alias("n_total")
        )
    else:
        n_total_df = vals.select(F.count(F.lit(1)).alias("n_total"))
    counted = (
        vals.join(F.broadcast(candidates), "value", "left_semi")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(n_total_df))
    )
    return counted.filter(
        F.col("cnt") * F.lit(int(den)) > F.col("n_total") * F.lit(int(num))
    )
