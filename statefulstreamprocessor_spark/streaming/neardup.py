"""Streaming MinHash-LSH near-duplicate candidate detection.

The in-flight form of the corpus near-dup sweep
(``operators/dedup.minhash_lsh_candidates``): documents arrive as a
stream, and candidate pairs surface AS they arrive instead of in a
corpus-wide batch self-join — the shape an ingest pipeline needs to flag
a crawl shard's near-dups against everything already ingested without
re-sweeping the corpus.

Mechanism: each document's 64-permutation MinHash signature (same Pandas
UDF as the batch op) is banded into (band, bucket) keys with the SAME
shared expression the batch op uses (``dedup.band_bucket_explode`` —
bucket parity by construction). A custom stateful op keyed by
(band, bucket) keeps the bucket's member ids; a newly arriving id emits
one candidate row against every retained member, then joins the state.
State is ids only — no signatures, no text — so a bucket costs at most
``max_bucket_size``·8 bytes.

Batch-parity contract (the gate pins this op to the SAME DuckDB oracle as
the batch sweep): when the stream delivers documents in ascending id
order, the emitted pair set — after read-side ``distinct()`` (a pair
surfaces once per shared band) and the same exact-Jaccard rescore —
EQUALS the batch sweep's output. The batch op truncates oversized buckets
to their ``max_bucket_size`` SMALLEST ids; under id-ordered arrival the
streaming op's "first ``max_bucket_size`` arrivals" are exactly those
smallest ids, so even the truncation knob agrees. Under arbitrary arrival
order the pair set is the same except within oversized buckets (a
documented recall/cost knob in both forms).

Candidates are emitted immediately on arrival (append mode, no watermark
needed for correctness — emission never waits on event time); replayed
ids (checkpoint recovery) are recognized in state and re-emit nothing.
Exact-Jaccard rescoring happens OUTSIDE the stream against the static
corpus (read-side distinct + the same rescore join the batch gate uses) —
state stays O(ids), and a production pipeline rescoring per epoch in
``foreachBatch`` composes the same pieces.

Scale shape: one shuffle on (band, bucket) — the same single exchange
the batch sweep pays — and state bounded by ``max_bucket_size`` per
bucket. No all-pairs stage anywhere; oversized buckets saturate instead
of exploding quadratically.

Reference: the reference engine has no near-dup operator (it is a
record-at-a-time joiner); this extends the training-data dedup layer
(SURVEY.md §2 addendum) into the streaming surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

__all__ = ["streaming_minhash_pairs"]

_OUT_SCHEMA = StructType(
    [
        StructField("id_a", LongType()),
        StructField("id_b", LongType()),
    ]
)
_STATE_SCHEMA = StructType([StructField("ids", ArrayType(LongType()))])


def _bucket_fn(max_bucket_size: int):
    def fn(key, pdfs, state: GroupState):
        kept: list[int] = (
            list(state.get[0]) if state.exists else []
        )
        known = set(kept)
        out_a: list[int] = []
        out_b: list[int] = []
        changed = False
        for pdf in pdfs:
            # ascending-id processing inside the batch keeps the
            # truncation decision identical to the batch op's
            # smallest-ids slice under id-ordered ingest
            for i in sorted(int(x) for x in pdf["id"]):
                if i in known:
                    continue  # replayed id: state already has it
                if len(kept) >= max_bucket_size:
                    continue  # saturated bucket: the explicit knob
                for m in kept:
                    a, b = (m, i) if m < i else (i, m)
                    out_a.append(a)
                    out_b.append(b)
                kept.append(i)
                known.add(i)
                changed = True
        if changed:
            state.update((kept,))
        if out_a:
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b})

    return fn


def streaming_minhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    n_perm: int = 64,
    bands: int = 16,
    max_bucket_size: int = 64,
) -> DataFrame:
    """Streaming candidate near-dup pairs: (id_a, id_b), id_a < id_b,
    one row per shared band per pair (read-side ``distinct()`` collapses
    them). Parameters mirror the batch
    ``operators/dedup.minhash_lsh_candidates`` exactly; see the module
    doc for the batch-parity contract.

    ``df``: streaming DataFrame; ``id_col`` must be integral and unique
    per document.
    """
    if n_perm % bands != 0:
        raise ValueError(f"bands ({bands}) must divide n_perm ({n_perm})")
    if max_bucket_size < 2:
        raise ValueError("max_bucket_size must be >= 2")
    from ..operators.dedup import (
        band_bucket_explode,
        minhash_signature_udf,
    )
    from ..shipping import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    sig = minhash_signature_udf(k, n_perm)
    with_sig = df.select(
        F.col(id_col).cast("long").alias("id"),
        sig(F.col(text_col)).alias("sig"),
    )
    banded = band_bucket_explode(with_sig, bands, n_perm // bands)
    return banded.groupBy("band", "bucket").applyInPandasWithState(
        _bucket_fn(max_bucket_size),
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
