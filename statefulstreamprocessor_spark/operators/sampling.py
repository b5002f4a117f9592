"""Deterministic sampling operators for training-data pipelines.

Reproducibility is the requirement at corpus scale: a sample must be a pure
function of the data, not of partitioning or RNG state, so re-runs, retries
and audits select identical rows. ``stratified_topk_sample`` orders each
stratum by a content hash (md5 of the id — stable across engines and runs)
and keeps the first k; ``hash_fraction_sample`` keeps rows whose id-hash
falls under a threshold (consistent-hash sampling, composable across
snapshots).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "stratified_topk_sample",
    "hash_fraction_sample",
    "quantile_bucket_sample",
    "leakage_safe_split",
]


def _local_bottomk_reducer(strata: list[str], order_cols: list[str], k: int):
    """mapInPandas stage: keep the k first-ordered rows per stratum within
    each Arrow batch — a superset of the global per-stratum top-k, so
    correctness is unchanged while only ~(batches × strata × k) rows reach
    the rank exchange (the cosine_topk local-reduce pattern)."""

    def reduce(batches):
        for pdf in batches:
            if len(pdf):
                # dropna=False: pandas' default silently discards rows with
                # a NULL stratum key, but the downstream Window.partitionBy
                # treats NULL as an ordinary partition — NULL-stratum rows
                # must survive the pre-reduction too.
                yield (
                    pdf.sort_values(order_cols, kind="mergesort")
                    .groupby(strata, sort=False, dropna=False)
                    .head(k)
                )

    return reduce


def stratified_topk_sample(
    df: DataFrame, strata: list[str] | str, id_col: str, k: int
) -> DataFrame:
    """Deterministic k rows per stratum, ordered by md5(id).

    A per-Arrow-batch local bottom-k pre-reduction runs below the rank
    window's hash exchange, so a billion-row stratum never fully sorts for
    k=20 — the exchange carries ~(batches × strata × k) rows, not the
    whole stratum (VERDICT round-2 minor #4; same shape as cosine_topk's
    pre-reduction, plan-guarded in tests/test_plans.py).
    """
    if isinstance(strata, str):
        strata = [strata]
    keyed = df.withColumn("__ord", F.md5(F.col(id_col).cast("string")))
    reduced = keyed.mapInPandas(
        _local_bottomk_reducer(strata, ["__ord", id_col], k), keyed.schema
    )
    w = Window.partitionBy(*strata).orderBy(F.col("__ord"), F.col(id_col))
    return (
        reduced.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__ord")
    )


def quantile_bucket_sample(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_buckets: int,
    k: int,
    bucket_width: int | None = None,
) -> DataFrame:
    """Length-balanced (or any-numeric-balanced) sampling: rank every row
    by ``(value, id)``, cut the rank range into ``n_buckets`` equal-count
    quantile buckets, and keep ``k`` md5-deterministic rows per bucket —
    the mixture-balancing sampler a training-data pipeline uses to keep
    short/long documents proportionally represented.

    Both ``value_col`` and ``id_col`` must be non-negative integers with
    ``id < 2³³`` (they pack into one bigint sort key). The global rank is
    the distributed two-level prefix-sum scan (``packing.global_cumsum``
    — never a corpus-wide single-partition ``row_number`` window), the
    bucket is the exact integer formula ``(rank−1)·n_buckets ÷ n``, and
    the per-bucket pick is :func:`stratified_topk_sample`'s pre-reduced
    md5 bottom-k. Output: ``id`` | ``value`` | ``bucket``.
    """
    from statefulstreamprocessor_spark.operators.packing import global_cumsum

    key_mult = 1 << 33
    # value < 2^30 keeps value*2^33 + id inside int64 — without this half
    # of the precondition an epoch-seconds value overflows the multiply
    # (ANSI: raw ARITHMETIC_OVERFLOW; non-ANSI: silent wraparound
    # mis-ranking)
    in_range = (
        (F.col(value_col) >= 0)
        & (F.col(value_col) < F.lit(1 << 30))
        & (F.col(id_col) >= 0)
        & (F.col(id_col) < F.lit(key_mult))
    )
    key = (
        F.col(value_col).cast("bigint") * F.lit(key_mult)
        + F.col(id_col).cast("bigint")
    )
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(value_col).alias("value"),
        # guard INSIDE the key expression (a free-standing assert column
        # would be pruned): out-of-range inputs fail loudly instead of
        # silently mis-ranking
        F.when(in_range, key)
        .otherwise(
            F.raise_error(
                F.lit(
                    "quantile_bucket_sample requires 0 <= value < 2^30 "
                    "and 0 <= id < 2^33"
                )
            ).cast("bigint")
        )
        .alias("__key"),
        F.lit(1).alias("__one"),
    )
    # default bucket width: one value-unit of the packed key — rows tie on
    # value stay in one range bucket; override for very hot single values.
    # `is None`, not falsy-or: an explicit bucket_width=0 must raise, not
    # silently become the default (the sessionize_banded discipline)
    width = key_mult if bucket_width is None else bucket_width
    if width <= 0:
        raise ValueError("bucket_width must be positive")
    ranked = global_cumsum(keyed, "__key", "__one", width, out_col="__rank")
    n_total = keyed.select(F.count(F.lit(1)).alias("__n"))
    bucketed = ranked.crossJoin(F.broadcast(n_total)).select(
        "id",
        "value",
        # integral `div`, not `/`: double division differs from exact
        # integer floor-division at 2^53-scale ranks and bucket edges
        F.expr(
            f"((__rank - 1) * {int(n_buckets)}) div __n"
        ).cast("bigint").alias("bucket"),
    )
    return stratified_topk_sample(bucketed, "bucket", "id", k)


def hash_fraction_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~fraction of rows by consistent hashing of the id: the same row
    is kept or dropped identically in every run and every overlapping
    snapshot (unlike rand()-based sampling)."""
    bucket = F.conv(F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8), 16, 10).cast("long")
    return df.filter(bucket < F.lit(int(fraction * 0xFFFFFFFF)))


def leakage_safe_split(
    df: DataFrame,
    cluster_col: str,
    splits: list[tuple[str, float]],
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row a train/val/test split by consistent-hashing its
    near-duplicate CLUSTER id — every member of a cluster lands in the
    same split, so near-duplicates never straddle the train/eval boundary
    (the contamination the dedup pipeline exists to prevent would
    otherwise re-enter through the splitter; composing this with
    ``connected_components`` output is the intended use).

    ``splits``: ordered (name, fraction) pairs, fractions summing to 1.
    Assignment: the 32-bit prefix of md5(cluster ∥ salt) falls into
    consecutive fraction-sized ranges of the hash space — a pure function
    of the data (re-runs, retries, incremental corpus extensions keep
    every existing row's split; only genuinely new clusters draw new
    assignments). Cross-engine exact: fixed-width lowercase hex compares
    lexicographically identically to its numeric value, so the oracle is
    a CASE over the same md5 prefix against the same hex boundaries.

    Scale shape: zero exchanges — one scalar hash expression per row on
    top of whatever produced the cluster column. The splitter itself is
    free at any corpus size.
    """
    if not splits:
        raise ValueError("splits must be a non-empty list of (name, frac)")
    fracs = [f for _, f in splits]
    if any(f <= 0 for f in fracs):
        raise ValueError(f"split fractions must be positive, got {fracs}")
    if abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {sum(fracs)}")
    names = [n for n, _ in splits]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate split names: {names}")
    prefix = F.substring(
        F.md5(F.concat(F.col(cluster_col).cast("string"), F.lit(salt))), 1, 8
    )
    # NULL cluster id fails LOUD (the gopher null_text discipline): the
    # concat above would otherwise yield a NULL prefix, every WHEN would
    # evaluate false, and the row would silently land in the LAST split —
    # a quiet eval-set contamination vector.
    prefix = F.when(
        F.col(cluster_col).isNull(),
        F.raise_error(
            F.lit(
                f"leakage_safe_split: NULL {cluster_col!r} — every row "
                "must carry a cluster id (singletons are their own "
                "cluster under connected_components)"
            )
        ),
    ).otherwise(prefix)
    # cumulative upper boundaries as fixed-width hex strings; the last
    # split takes everything remaining (no float-edge row can fall out)
    expr = F.lit(names[-1])
    cum = 0.0
    bounds = []
    for _, f in splits[:-1]:
        cum += f
        bounds.append(format(int(cum * 0xFFFFFFFF), "08x"))
    for name, b in zip(reversed(names[:-1]), reversed(bounds)):
        expr = F.when(prefix < F.lit(b), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)
