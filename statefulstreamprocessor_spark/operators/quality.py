"""Corpus-quality operators for LLM-training-data pipelines.

Repetition filtering is the canonical web-corpus cleaning rule (the
"repetition removal" family popularized by the Gopher/MassiveText and
RefinedWeb filtering recipes): documents whose text is dominated by a few
repeated words/lines are boilerplate, not prose. The reference engine's
quality hooks are per-record scalar transforms
(``03_Stream_Connector``-style record maps); here the corpus-level
form is expressed as DataFrame aggregations so Catalyst keeps everything
JVM-side and map-side-combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_repetition_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document word-repetition statistics (Gopher-style quality rule).

    Output: ``id`` | ``n_words`` | ``n_distinct_words`` | ``dup_word_ratio``
    (fraction of word occurrences that repeat an earlier word) | ``top_word``
    | ``top_word_ratio`` (most-frequent-word share).

    ``top_word`` is the deterministic argmax: highest count, ties broken by
    the lexicographically GREATEST word — computed as ``max(struct(cnt, w))``
    so the argmax rides the same single aggregation instead of a
    row_number window (one fewer exchange).

    Physical shape (the 100-TB story): explode → partial-aggregated
    ``groupBy(id, word)`` — the map-side combine collapses each document's
    word multiset to its distinct words BEFORE the exchange, because a
    document's words all live in its own input partition — then a final
    ``groupBy(id)`` over the (much smaller) distinct-word rows. Two
    exchanges, both carrying pre-reduced rows; no windows, no Python.

    ``explode_outer`` (not ``explode``): plain explode makes the optimizer
    infer a ``size(split(..)) > 0`` scan filter that re-evaluates the split
    at the scan (see ngram_jaccard_pairs); NULL/empty-word rows are dropped
    by the explicit post-filter instead. Documents with no words do not
    appear in the output.
    """
    words = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode_outer(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("w"),
        )
        .filter(F.col("w").isNotNull() & (F.col("w") != ""))
    )
    wc = words.groupBy("id", "w").agg(F.count(F.lit(1)).alias("cnt"))
    out = wc.groupBy("id").agg(
        F.sum("cnt").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.max(F.struct("cnt", "w")).alias("_top"),
    )
    return out.select(
        "id",
        "n_words",
        "n_distinct_words",
        F.round(
            (F.col("n_words") - F.col("n_distinct_words"))
            / F.col("n_words"),
            6,
        ).alias("dup_word_ratio"),
        F.col("_top.w").alias("top_word"),
        F.round(F.col("_top.cnt") / F.col("n_words"), 6).alias(
            "top_word_ratio"
        ),
    )


def ngram_repetition_stats(
    df: DataFrame, text_col: str, id_col: str, n: int = 2
) -> DataFrame:
    """Per-document word-n-gram repetition statistics — the n-gram half
    of the Gopher/MassiveText repetition rules (word-level lives in
    :func:`word_repetition_stats`): documents dominated by a few repeated
    n-grams are templated boilerplate even when individual words vary.

    Output: ``id`` | ``n_grams`` (positional occurrences) |
    ``n_distinct_ngrams`` | ``dup_ngram_ratio`` (fraction of occurrences
    repeating an earlier identical n-gram) | ``top_ngram_ratio``
    (most-frequent n-gram's share).

    Grams ride as 64-bit xxhash of the token window (never materialized
    as strings — the :func:`~statefulstreamprocessor_spark.operators.dedup.ngram_jaccard_pairs`
    discipline; the ratios are identical to the string formulation absent
    64-bit collisions, which is how the DuckDB oracle checks them). Same
    two pre-reduced exchanges as the word form; no windows, no Python.
    Documents shorter than ``n`` tokens contribute one shorter gram
    (the full token list), mirroring ngram_jaccard_pairs.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    # lambda-free gram construction (round 7, the ngram_jaccard_pairs
    # rewrite): arrays_zip of n shifted slices instead of the interpreted
    # transform/sequence fold — same token windows (NULL pads mark
    # "past end" uniquely since split() never yields NULL tokens), each
    # occurrence hashed after the explode with one codegen'd xxhash64
    L = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    zips = F.arrays_zip(*[F.slice(toks, i + 1, L) for i in range(n)])
    grams = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.explode_outer(zips).alias("__gs"),
        )
        .filter(F.col("__gs").isNotNull())
        .select("id", F.xxhash64("__gs").alias("g"))
    )
    gc = grams.groupBy("id", "g").agg(F.count(F.lit(1)).alias("cnt"))
    out = gc.groupBy("id").agg(
        F.sum("cnt").alias("n_grams"),
        F.count(F.lit(1)).alias("n_distinct_ngrams"),
        F.max("cnt").alias("_topc"),
    )
    return out.select(
        "id",
        "n_grams",
        "n_distinct_ngrams",
        F.round(
            (F.col("n_grams") - F.col("n_distinct_ngrams"))
            / F.col("n_grams"),
            6,
        ).alias("dup_ngram_ratio"),
        F.round(F.col("_topc") / F.col("n_grams"), 6).alias(
            "top_ngram_ratio"
        ),
    )
