"""Training-data source mixture: weighted per-source epoch interleaving.

A pretraining corpus is rarely consumed at one epoch per source: the
mixture recipe assigns each source a WEIGHT (e.g. wikipedia 3.0 epochs,
common-crawl 0.8, code 1.5 — the Pile/C4 pattern), and the pipeline must
materialize that mixture deterministically so re-runs, retries and audits
produce the identical corpus.

Semantics for weight ``w`` over a source with ``n`` rows:

* ``floor(w)`` full copies of every row — emitted with ``epoch`` =
  0..floor(w)−1;
* one FRACTIONAL copy (``epoch = floor(w)``) holding each row with
  probability ``w − floor(w)``, selected by consistent hashing of
  ``(id, salt)`` — the same row is kept or dropped identically in every
  run (the ``hash_fraction_sample`` rule, sampling.py), and the
  fractional pick is independent of the full copies.

Expected output size is Σ n_source · w_source, exactly ``floor`` +
binomial on the fraction.

Scale shape: ZERO exchanges — a broadcast-literal map lookup, one
``explode(sequence(...))`` and a filter, all inside whole-stage codegen.
The corpus is scanned once; no join, no shuffle, no UDF. The fractional
threshold ``int(frac · 0xFFFFFFFF)`` is computed driver-side per source
(exact, engine-portable), so any engine that can md5 the same bytes
reproduces the identical mixture — which is how the DuckDB oracle replays
it.

Reference: the reference engine has no corpus-mixture operator (it is a
record-at-a-time joiner); this is part of the training-data layer built
alongside SURVEY.md §2.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mixture_interleave"]


def mixture_interleave(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weights: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Materialize the weighted mixture: every input row becomes
    ``floor(w)`` full-epoch rows plus a hash-selected fractional-epoch
    row, tagged with an ``epoch`` column (0-based copy index).

    A row whose ``group_col`` value has no entry in ``weights`` raises at
    execution time (fail closed — a silently dropped source is a corrupt
    mixture; give a source weight 0.0 to drop it explicitly).
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    for g, w in weights.items():
        if not (isinstance(w, (int, float)) and math.isfinite(w) and w >= 0):
            raise ValueError(f"weight for {g!r} must be finite and >= 0")
    if "epoch" in df.columns:
        raise ValueError("input already has an 'epoch' column")
    full_pairs, thr_pairs = [], []
    for g, w in weights.items():
        full = int(math.floor(w))
        # exact integer threshold computed driver-side: the fractional
        # copy keeps rows with hash32 < thr, identically in every engine
        thr = int((float(w) - full) * 0xFFFFFFFF)
        full_pairs += [F.lit(g), F.lit(full)]
        thr_pairs += [F.lit(g), F.lit(thr)]
    full = F.create_map(*full_pairs)[F.col(group_col)]
    thr = F.create_map(*thr_pairs)[F.col(group_col)]
    # fail closed on unmapped groups — guard INSIDE the expression the
    # plan keeps (a free-standing assert column would be pruned; the
    # quantile_bucket_sample discipline)
    full_checked = (
        F.when(full.isNotNull(), full)
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "mixture_interleave: no weight for "
                        f"{group_col}="
                    ),
                    F.col(group_col).cast("string"),
                )
            ).cast("int")
        )
    )
    h32 = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return (
        df.withColumn("__full", full_checked)
        .withColumn("__thr", thr)
        .withColumn(
            "epoch",
            F.explode(
                F.sequence(
                    F.lit(0).cast("bigint"),
                    F.col("__full").cast("bigint"),
                )
            ),
        )
        .filter((F.col("epoch") < F.col("__full")) | (h32 < F.col("__thr")))
        .drop("__full", "__thr")
    )
