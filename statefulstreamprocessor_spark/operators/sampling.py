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

__all__ = ["stratified_topk_sample", "hash_fraction_sample"]


def stratified_topk_sample(
    df: DataFrame, strata: list[str] | str, id_col: str, k: int
) -> DataFrame:
    """Deterministic k rows per stratum, ordered by md5(id)."""
    if isinstance(strata, str):
        strata = [strata]
    w = Window.partitionBy(*strata).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def hash_fraction_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~fraction of rows by consistent hashing of the id: the same row
    is kept or dropped identically in every run and every overlapping
    snapshot (unlike rand()-based sampling)."""
    bucket = F.conv(F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8), 16, 10).cast("long")
    return df.filter(bucket < F.lit(int(fraction * 0xFFFFFFFF)))
