"""Token-window document chunking with overlap (context-window prep).

Long web documents are cut into model-context-sized pieces before
training or embedding: windows of ``chunk_tokens`` whitespace tokens,
consecutive windows sharing ``overlap_tokens`` (RAG / long-doc training
convention). Chunk starts step by ``stride = chunk - overlap``; the last
window is pulled BACK to ``n - chunk`` when the final stride overshoots,
so every token is covered and every emitted chunk is full-width whenever
the document has at least ``chunk_tokens`` tokens (shorter documents
yield exactly one short chunk — their whole text).

Scale shape: ZERO exchanges and zero joins — tokenization, window-start
generation (``sequence`` + ``transform``), slicing and re-joining are all
per-row Catalyst expressions inside whole-stage codegen; ``posexplode``
amplifies rows ~n_tokens/stride× with no shuffle. Chunk text re-joins
tokens with a single space, i.e. runs of whitespace are normalized —
token-window semantics, not byte-window (document the difference; a
byte-exact slice would be ``substring`` windows instead).

Reference: the reference engine has no corpus-chunking operator (it is a
record-at-a-time joiner); this is part of the training-data layer built
alongside SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_documents"]


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int,
    overlap_tokens: int = 0,
    token_regex: str = r"\s+",
) -> DataFrame:
    """Cut every document into overlapping token windows.

    Output: ``id`` | ``chunk_id`` (0-based, in order) | ``chunk_text``
    (tokens re-joined with single spaces) | ``n_tokens`` (tokens in this
    chunk) | ``start_token`` (0-based offset of the chunk's first token).
    Documents with no tokens (NULL / empty / whitespace-only) emit no
    chunks.

    ``overlap_tokens`` must be < ``chunk_tokens`` (stride must advance).
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not (0 <= overlap_tokens < chunk_tokens):
        raise ValueError(
            "overlap_tokens must satisfy 0 <= overlap < chunk_tokens, got "
            f"{overlap_tokens} vs {chunk_tokens}"
        )
    stride = chunk_tokens - overlap_tokens
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), token_regex),
        lambda t: t != "",
    )
    n = F.size(toks)
    # full-stride starts: 0, stride, ... while start <= n - chunk;
    # one pulled-back tail start at n - chunk when the last full-stride
    # window stops short of the end (n > chunk and (n-chunk) % stride != 0)
    n_full = F.floor((n - F.lit(chunk_tokens)) / F.lit(stride)) + F.lit(1)
    full_starts = F.transform(
        F.sequence(F.lit(0), n_full.cast("int") - F.lit(1)),
        lambda i: i * F.lit(stride),
    )
    tail = (n_full - F.lit(1)) * F.lit(stride) + F.lit(chunk_tokens)
    starts = F.when(n <= F.lit(0), F.array().cast("array<int>")).otherwise(
        F.when(
            n < F.lit(chunk_tokens), F.array(F.lit(0))
        ).otherwise(
            F.when(
                tail < n,
                F.concat(
                    full_starts, F.array((n - F.lit(chunk_tokens)).cast("int"))
                ),
            ).otherwise(full_starts)
        )
    )
    return (
        df.select(
            F.col(id_col).alias("id"),
            toks.alias("__t"),
            F.posexplode(starts).alias("chunk_id", "start_token"),
        )
        .select(
            "id",
            "chunk_id",
            F.concat_ws(
                " ", F.slice("__t", F.col("start_token") + 1, chunk_tokens)
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_tokens), F.size("__t") - F.col("start_token")
            ).cast("int").alias("n_tokens"),
            F.col("start_token").cast("int").alias("start_token"),
        )
    )
