"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The image/audio codec libraries are
not in this container, so the *decode* step is stubbed two ways:

* ``decode_stub="deterministic"`` (default, tested): a seeded fake decoder
  that derives shape + pixel stats purely from the bytes — the Spark-side
  plumbing (schema, batching, partition flow, UDF signatures) is fully
  real and asserted;
* ``decode_stub="library"``: raises ``NotImplementedError`` naming the
  optional dependency (PIL/av) a production deployment would install.

Feature extraction (byte-histogram + moments) is real vectorized numpy —
representative of the batch shape an embedding model sees.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["attach_binary_payload", "decode_metadata", "extract_binary_features"]

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, "
    "byte_sum bigint, byte_sq_sum bigint, "
    "mean_byte double, std_byte double, hist array<int>"
)


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Test harness: derive a deterministic opaque binary payload + typed
    metadata struct from a text column (stand-in for real image bytes)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.lit("fake/image").alias("mime"),
        ).alias("meta"),
    )


def decode_metadata(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: shape derived from content bytes."""
    if payload is None or len(payload) == 0:
        return 0, 0
    w = 16 + (payload[0] % 48)
    h = 16 + (payload[-1] % 48)
    return w, h


def extract_binary_features(
    df: DataFrame, id_col: str = "doc_id", decode_stub: str = "deterministic"
) -> DataFrame:
    """mapInPandas feature extraction over (id, payload) rows.

    Arrow batches in, vectorized numpy per batch, Arrow batches out — the
    exact plumbing a real decoder/embedder plugs into.
    """
    if decode_stub == "library":
        raise NotImplementedError(
            "real image decoding needs an optional codec dependency "
            "(e.g. pillow / pyav) not present in this environment; use "
            "decode_stub='deterministic' for the tested fake decoder"
        )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                b = np.frombuffer(payload or b"", dtype=np.uint8)
                w, h = decode_metadata(payload)
                if len(b) == 0:
                    rows.append((doc_id, 0, w, h, 0, 0, 0.0, 0.0, [0] * 8))
                    continue
                hist = np.bincount(b >> 5, minlength=8).astype(int).tolist()
                b64 = b.astype(np.int64)
                rows.append(
                    (
                        doc_id,
                        int(len(b)),
                        w,
                        h,
                        # exact integer moments: hash-stable at the driver
                        # gate (float mean/std depend on summation order)
                        int(b64.sum()),
                        int((b64 * b64).sum()),
                        round(float(b.mean()), 6),
                        round(float(b.std()), 6),
                        hist,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_bytes", "width", "height",
                    "byte_sum", "byte_sq_sum",
                    "mean_byte", "std_byte", "hist",
                ],
            )

    return df.select(id_col, "payload").mapInPandas(extract, FEATURE_SCHEMA)
