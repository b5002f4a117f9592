"""Corpus vocabulary statistics — the token-frequency sweep every
tokenizer-training / corpus-report pipeline runs.

Physical shape for the 100-TB corpus: the word explode is reduced by TWO
cascaded map-side-combinable aggregations — ``groupBy(word, doc)`` first
(a document's occurrences collapse inside its own input partition before
any exchange), then ``groupBy(word)`` for term frequency + document
frequency — followed by a per-partition local top-k pre-reduction
(mapInPandas, the :mod:`similarity` ``cosine_topk`` discipline) so the
final rank exchange carries at most ``partitions × k`` rows, never the
vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _local_topk(order_col: str, tie_col: str, k: int):
    def reduce(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pdf.sort_values(
                [order_col, tie_col], ascending=[False, True]
            ).head(k)

    return reduce


def vocab_topk(df: DataFrame, text_col: str, id_col: str, k: int = 100) -> DataFrame:
    """Top-k corpus vocabulary by term frequency.

    Output: ``word`` | ``tf`` (total occurrences) | ``df`` (documents
    containing the word) | ``rank``. Total order: tf descending, then word
    ascending — reproducible across engines and partitionings.

    ``explode_outer`` + explicit post-filter for the usual
    InferFiltersFromGenerate reason (see ngram_jaccard_pairs).
    """
    words = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode_outer(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("word"),
        )
        .filter(F.col("word").isNotNull() & (F.col("word") != ""))
    )
    per_doc = words.groupBy("word", "id").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = per_doc.groupBy("word").agg(
        F.sum("cnt").alias("tf"), F.count(F.lit(1)).alias("df")
    )
    reduced = vocab.mapInPandas(_local_topk("tf", "word", k), vocab.schema)
    w = Window.orderBy(F.desc("tf"), F.asc("word"))
    return (
        reduced.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
