"""As-of join (one-directional nearest-neighbor enrichment).

The one-sided specialization of the reference's pairwise join: each left
record picks only its latest-earlier (backward) or earliest-later (forward)
right partner — join case JR2's last gap record / JS2 respectively
(reference ``05_LocalStreamBuffer/local_stream_buffer.py:280-308``).

Implemented with the union + running-``last`` window technique rather than a
join: one hash exchange on the key, one sort, O(n) window pass — no
broadcast, no range explosion, skew-tolerant (per-key cost linear).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    df_left: DataFrame,
    df_right: DataFrame,
    keys: list[str] | str,
    ts_col: str,
    direction: str = "backward",
    tolerance: float | None = None,
    right_prefix: str = "right_",
) -> DataFrame:
    """Enrich each left row with its nearest right row in one time direction.

    direction: "backward" = latest right with right.ts <= left.ts;
               "forward"  = earliest right with right.ts >= left.ts.
    tolerance: optional max |dt| in seconds. Left rows with no partner in
    range are kept with nulls (left-outer semantics).
    Output: all left columns + ``right_<col>`` for right non-key columns.
    """
    if isinstance(keys, str):
        keys = [keys]
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    left_payload = [c for c in df_left.columns if c not in keys]
    right_payload = [c for c in df_right.columns if c not in keys]

    # at equal ts the right row must be visible to the left row, so right
    # sorts first in backward mode and last-reversed in forward mode
    merged = df_right.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            df_left.select(F.struct(*left_payload).alias("x")).schema["x"].dataType
        ).alias("__lp"),
        F.struct(*right_payload).alias("__rp"),
    ).unionByName(
        df_left.select(
            *keys,
            F.col(ts_col).alias("__ts"),
            F.lit(1).alias("__side"),
            F.struct(*left_payload).alias("__lp"),
            F.lit(None).cast(
                df_right.select(F.struct(*right_payload).alias("x")).schema[
                    "x"
                ].dataType
            ).alias("__rp"),
        )
    )

    if direction == "backward":
        # asc traversal: the right row (side 0) precedes an equal-ts left
        # row, so right.ts <= left.ts is inclusive
        order = [F.col("__ts").asc(), F.col("__side").asc()]
    else:
        # desc traversal must ALSO put the right row first at equal ts —
        # side ASC (0 before 1), not desc — so right.ts >= left.ts is
        # inclusive as documented
        order = [F.col("__ts").desc(), F.col("__side").asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cand = F.last(
        F.when(F.col("__side") == 0, F.struct(F.col("__ts").alias("t"), F.col("__rp").alias("p"))),
        ignorenulls=True,
    ).over(w)

    ann = merged.withColumn("__cand", cand).filter(F.col("__side") == 1)
    if tolerance is not None:
        ts_type = df_left.schema[ts_col].dataType.simpleString()
        if ts_type.startswith("timestamp"):
            def secs(c):
                return c.cast("timestamp").cast("double")
        else:
            def secs(c):
                return c.cast("double")
        in_tol = (
            F.abs(secs(F.col("__cand.t")) - secs(F.col("__ts")))
            <= F.lit(float(tolerance))
        )
        ann = ann.withColumn("__cand", F.when(in_tol, F.col("__cand")))

    out = (
        [F.col(k) for k in keys]
        + [
            F.col(f"__lp.{c}").alias(c)
            for c in left_payload
        ]
        + [F.col("__cand.t").alias(f"{right_prefix}{ts_col}")]
        + [
            F.col(f"__cand.p.{c}").alias(f"{right_prefix}{c}")
            for c in right_payload
            if c != ts_col
        ]
    )
    return ann.select(*out)
