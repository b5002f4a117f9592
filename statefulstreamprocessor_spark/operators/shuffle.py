"""Deterministic global shuffle + balanced shard assignment.

Before training, an LLM corpus is shuffled into a pseudorandom but
REPRODUCIBLE order and cut into k equal shards (the "global shuffle" of
C4/Pile-style pipelines). The naive form — ``ORDER BY hash`` then
``row_number()`` — funnels the whole corpus through one sort partition.
Here the permutation rank is computed with the same two-level scan the
packing operator uses (packing.py), keyed on an md5 of (seed, id):

1. every row gets ``h = md5(seed || ':' || id)`` — the permutation key
   (deterministic in the seed; changing the seed is a fresh shuffle);
2. rows bucket by the first 16 bits of ``h`` — 65,536 range buckets that
   are uniform BY CONSTRUCTION (hash prefix), so no bucket is hot and
   each holds ~n/65536 rows at any corpus size;
3. one count per bucket, a prefix window over the 65,536 bucket totals
   (not the corpus), and an in-bucket ``row_number`` ordered by
   ``(h, id)`` give the exact global rank ``m`` of every row — one hash
   exchange over the data, one broadcast join back;
4. pure arithmetic turns the rank into a balanced shard + position:
   ``shard = m*k div n`` and ``pos = m - ceil(shard*n/k)`` — shard sizes
   differ by at most one row, no per-shard window needed.

md5 (not xxhash64) keeps the permutation portable: any engine that can
compute md5 over the same bytes reproduces the identical order —
lowercase fixed-width hex compares lexicographically exactly like the
underlying 128-bit integer.

Reference: the reference engine has no corpus-shuffle operator (it is a
record-at-a-time joiner); this is part of the training-data layer built
alongside SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: str,
    n_rows: int | None = None,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Assign every row a ``(shard, pos)`` under the seed-determined
    pseudorandom permutation: ``shard`` ∈ [0, n_shards), sizes balanced
    to ±1 row; ``pos`` is the row's 0-based position within its shard in
    permutation order. ``id_col`` must be unique (it ties off the
    astronomically-unlikely md5 collisions and salts the hash).

    ``n_rows``: total row count if the caller already knows it (skips
    one counting pass over the input).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if n_rows is None:
        n_rows = df.count()
    if n_rows == 0:
        return (
            df.withColumn(shard_col, F.lit(0).cast("bigint"))
            .withColumn(pos_col, F.lit(0).cast("bigint"))
        )
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    rows = df.withColumn("__h", h).withColumn(
        "__b", F.conv(F.substring("__h", 1, 4), 16, 10).cast("int")
    )
    partials = rows.groupBy("__b").agg(F.count(F.lit(1)).alias("__c"))
    off_w = (
        Window.orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = partials.select(
        "__b", (F.sum("__c").over(off_w) - F.col("__c")).alias("__off")
    )
    in_w = Window.partitionBy("__b").orderBy("__h", id_col)
    ranked = (
        rows.join(F.broadcast(offsets), "__b")
        .withColumn(
            "__m",
            (F.col("__off") + F.row_number().over(in_w) - F.lit(1)).cast(
                "bigint"
            ),
        )
    )
    k, n = int(n_shards), int(n_rows)
    shard = F.expr(f"(__m * {k}) div {n}")
    # backtick-quote the caller-supplied output column (ADVICE r06): a
    # shard_col with spaces/dots/hyphens would otherwise break the parse
    # or resolve to the wrong expression (k and n are int()-sanitized)
    sq = "`" + shard_col.replace("`", "``") + "`"
    return (
        ranked.withColumn(shard_col, shard)
        .withColumn(
            pos_col,
            F.col("__m")
            - F.expr(f"({sq} * {n} + {k} - 1) div {k}"),
        )
        .drop("__h", "__b", "__off", "__m")
    )
