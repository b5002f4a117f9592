"""Salted two-phase aggregation for hot-key skew.

At webtext scale a handful of domains dominate; a naive
``groupBy(domain)`` puts a hot domain's entire partition on one task.
``salted_agg`` shuffles on (key, salt) first — splitting a hot key across
``n_salts`` tasks — then combines the (tiny) per-salt partials in a second
exchange. Results are identical to the unsalted aggregation (the oracle
check), only the physical distribution changes. AQE's skew handling covers
sort-merge joins; aggregation skew needs this explicit pattern.

Supported partial-mergeable aggs: count, sum, min, max (extendable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg"]

_MERGE = {
    "count": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str] | str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    aggs: output_name -> (fn, column) with fn in {count,sum,min,max};
    e.g. {"n": ("count", "*"), "max_v": ("max", "value")}.
    """
    if isinstance(keys, str):
        keys = [keys]
    # deterministic salt: hash full row content (never rand() — replays and
    # retries must salt identically)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partial_exprs = []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"__p_{name}"))
        else:
            partial_exprs.append(getattr(F, fn)(F.col(col)).alias(f"__p_{name}"))
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_exprs)
    final_exprs = [
        _MERGE[fn](F.col(f"__p_{name}")).alias(name)
        for name, (fn, _col) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*final_exprs)
