"""Exact-parity replay join — reproduces the reference engine's emitted rows.

Unlike :mod:`.nn_join` (the deterministic closure), this operator reproduces
the reference LocalStreamBuffer's *actual* output for a given arrival
interleaving, which for shuffled cross-stream arrival is a strict subset of
the closure (the reference's JR1 "advance-one" at
``local_stream_buffer.py:271-272`` and JS2's earliest-*arrived* partner at
``:296-308`` make some backward pairings arrival-dependent).

Arrival order is an explicit column (Kafka offset / file row number / ingest
sequence) — the Spark-idiomatic way to express "replay exactly what the
single-threaded engine would have emitted". The kernel is vectorized numpy
inside a cogrouped ``applyInPandas``; per-key cost O(n log n); keys
parallelize across executors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from ..kernels import replay_join_pairs

__all__ = ["replay_join"]


def replay_join(
    df_r: DataFrame,
    df_s: DataFrame,
    keys: list[str] | str,
    ts_col: str,
    arrival_col: str,
    delta: float | None = None,
) -> DataFrame:
    """Join two sides with exact reference-output parity.

    Both inputs need ``keys``, ``ts_col`` (numeric event time or timestamp)
    and ``arrival_col`` (global arrival rank, unique across both sides within
    a key). Output: keys + ``r_<col>``/``s_<col>`` for non-key columns.
    """
    if isinstance(keys, str):
        keys = [keys]
    r_payload = [c for c in df_r.columns if c not in keys]
    s_payload = [c for c in df_s.columns if c not in keys]
    # both sides often derive from one parent DataFrame; identical attribute
    # exprIds across the two cogroup children make Catalyst mis-prune the
    # right side — aliasing mints fresh exprIds (self-join disambiguation)
    df_s = df_s.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__sr_{c}") for c in s_payload],
    )
    sr = {c: f"__sr_{c}" for c in s_payload}

    key_fields = [df_r.schema[k] for k in keys]
    out_schema = StructType(
        key_fields
        + [
            StructField(f"r_{f.name}", f.dataType, True)
            for f in df_r.schema
            if f.name in r_payload
        ]
        + [
            StructField(f"s_{f.name[len('__sr_'):]}", f.dataType, True)
            for f in df_s.schema
            if f.name.startswith("__sr_")
        ]
    )

    def join_group(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        lt = left.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        rt_ = right.sort_values(sr[ts_col], kind="mergesort").reset_index(drop=True)
        lts = lt[ts_col].to_numpy()
        rts = rt_[sr[ts_col]].to_numpy()
        if lts.dtype.kind == "M":  # datetime64 → int64 epoch micros
            lts = lts.astype("datetime64[us]").astype(np.int64)
            rts = rts.astype("datetime64[us]").astype(np.int64)
            d = None if delta is None else float(delta) * 1e6
        else:
            d = delta
        ri, si = replay_join_pairs(
            lts,
            lt[arrival_col].to_numpy(),
            rts,
            rt_[sr[arrival_col]].to_numpy(),
            d,
        )
        out = {}
        for k in keys:
            out[k] = lt[k].to_numpy()[ri] if len(ri) else lt[k].to_numpy()[:0]
        for c in r_payload:
            out[f"r_{c}"] = lt[c].to_numpy()[ri]
        for c in s_payload:
            out[f"s_{c}"] = rt_[sr[c]].to_numpy()[si]
        return pd.DataFrame(out)

    return (
        df_r.groupBy(*[F.col(k) for k in keys])
        .cogroup(df_s.groupBy(*[F.col(k) for k in keys]))
        .applyInPandas(join_group, out_schema)
    )
