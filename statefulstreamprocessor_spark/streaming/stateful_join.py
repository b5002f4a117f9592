"""Streaming closure nearest-neighbor join via ``applyInPandasWithState``.

The watermark-native form of the reference's LocalStreamBuffer join
(reference ``05_LocalStreamBuffer/local_stream_buffer.py``): per key, state
holds the not-yet-retired records of both sides; each micro-batch decides
pairs that have become watermark-final and retires records that can never
pair again (the reference's buffer-strip rule J4,
``local_stream_buffer.py:317-350``, generalized to watermark semantics).

Semantics = the deterministic closure (same as :func:`operators.nn_join`):
* alpha — (x, earliest other-side at-or-after x): emitted in the first
  batch where the watermark passes that partner's event time (no earlier
  other-side record can still arrive in between);
* beta — (latest other-side at-or-before y, y), skipped when adjacent to
  its partner (alpha duplicate): the backward relation is final once the
  watermark passes y; emission additionally waits for proof that *some*
  other-side record at-or-after y exists (the reference's JR1 lookahead,
  ``local_stream_buffer.py:260-278``) — tracked via the monotone per-side
  max-event-time and a pending list.

Each pair is emitted exactly once; with a final watermark past the data's
max event time, the emitted set equals the batch closure join exactly
(asserted by the golden streaming tests). Per-batch work is vectorized
numpy over the per-key state frame; state size is watermark-bounded.

Retirement invariants (proved in the design notes, tested):
a row is dropped only when it is fully decided AND a same-side row with
event time ≤ watermark supersedes it; every prev/next/prev-any lookup a
future decision needs is therefore still in state.
"""

from __future__ import annotations

import pickle
from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)

__all__ = ["streaming_nn_join"]

_NEG = np.int64(np.iinfo(np.int64).min)


def _decide_batch(
    buf: pd.DataFrame,
    pend: list[tuple[int, int, dict[str, Any]]],
    max_other: dict[int, np.int64],
    wm_us: np.int64,
    delta_us: float | None,
    payload_cols: list[str],
    ts_col: str,
) -> tuple[pd.DataFrame, list[tuple[int, int, dict[str, Any]]], list[dict[str, Any]]]:
    """Pure per-key decision step: returns (new_buf, new_pend, emitted rows).

    buf columns: __ts int64(us), __side int8 (0=r,1=s), __alpha, __beta bool,
    + original ts + payload columns. pend entries: (needed_side, threshold_us,
    out_row). Factored out of the Spark UDF so it is unit-testable.
    """
    out: list[dict[str, Any]] = []

    def mk_row(i_r: int, i_s: int) -> dict[str, Any] | None:
        t_r, t_s = buf["__ts"].iat[i_r], buf["__ts"].iat[i_s]
        if delta_us is not None and abs(float(t_r) - float(t_s)) > delta_us:
            return None
        row = {f"r_{ts_col}": buf[ts_col].iat[i_r], f"s_{ts_col}": buf[ts_col].iat[i_s]}
        for c in payload_cols:
            row[f"r_{c}"] = buf[c].iat[i_r]
            row[f"s_{c}"] = buf[c].iat[i_s]
        return row

    n = len(buf)
    if n:
        side = buf["__side"].to_numpy()
        pos_r = np.nonzero(side == 0)[0]
        pos_s = np.nonzero(side == 1)[0]
        ts = buf["__ts"].to_numpy()

        def next_other(i: int) -> int:
            arr = pos_s if side[i] == 0 else pos_r
            j = np.searchsorted(arr, i, side="right")
            return int(arr[j]) if j < len(arr) else -1

        def prev_other(i: int) -> int:
            arr = pos_s if side[i] == 0 else pos_r
            j = np.searchsorted(arr, i, side="left") - 1
            return int(arr[j]) if j >= 0 else -1

        alpha_undone = np.nonzero(~buf["__alpha"].to_numpy())[0]
        for i in alpha_undone:
            j = next_other(int(i))
            if j >= 0 and ts[j] <= wm_us:
                i_r, i_s = (int(i), j) if side[i] == 0 else (j, int(i))
                row = mk_row(i_r, i_s)
                if row is not None:
                    out.append(row)
                buf.iat[int(i), buf.columns.get_loc("__alpha")] = True

        beta_undone = np.nonzero((~buf["__beta"].to_numpy()) & (ts <= wm_us))[0]
        for i in beta_undone:
            i = int(i)
            j = prev_other(i)
            # adjacency rule: skip when the immediately preceding record is
            # other-side (that record's alpha already covers this pair)
            if j >= 0 and not (i > 0 and side[i - 1] != side[i]):
                i_r, i_s = (i, j) if side[i] == 0 else (j, i)
                row = mk_row(i_r, i_s)
                if row is not None:
                    other = 1 - int(side[i])
                    if max_other[other] >= ts[i]:
                        out.append(row)
                    else:
                        pend.append((other, int(ts[i]), row))
            buf.iat[i, buf.columns.get_loc("__beta")] = True

        # retirement: drop fully-decided rows superseded by a same-side row
        # with event time <= watermark (generalized J4)
        keep = np.ones(n, dtype=bool)
        for s_val, pos in ((0, pos_r), (1, pos_s)):
            if len(pos) == 0:
                continue
            below = pos[ts[pos] <= wm_us]
            if len(below) == 0:
                continue
            t_thresh = ts[below].max()
            decided = buf["__alpha"].to_numpy() & buf["__beta"].to_numpy()
            drop = (side == s_val) & (ts < t_thresh) & decided
            keep &= ~drop
        buf = buf.loc[keep].reset_index(drop=True)

    # flush pending betas whose other-side existence is now proven
    still: list[tuple[int, int, dict[str, Any]]] = []
    for other, thresh, row in pend:
        if max_other[other] >= thresh:
            out.append(row)
        else:
            still.append((other, thresh, row))
    return buf, still, out


def streaming_nn_join(
    df: DataFrame,
    keys: list[str] | str,
    ts_col: str,
    side_col: str,
    delta: float | None = None,
) -> DataFrame:
    """Streaming closure join over a single merged stream.

    ``df`` must be a streaming DataFrame with an event-time watermark on
    ``ts_col`` (TimestampType), a ``side_col`` with values 'r'/'s', and any
    payload columns. Output: keys + r_/s_-prefixed ts and payload columns,
    append mode, exactly-once per pair.
    """
    if isinstance(keys, str):
        keys = [keys]
    from ..shipping import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    payload_cols = [c for c in df.columns if c not in [*keys, ts_col, side_col]]
    ts_field = df.schema[ts_col]

    out_schema = StructType(
        [df.schema[k] for k in keys]
        + [StructField(f"r_{ts_col}", ts_field.dataType, True)]
        + [StructField(f"r_{c}", df.schema[c].dataType, True) for c in payload_cols]
        + [StructField(f"s_{ts_col}", ts_field.dataType, True)]
        + [StructField(f"s_{c}", df.schema[c].dataType, True) for c in payload_cols]
    )
    state_schema = StructType(
        [
            StructField("buf", BinaryType(), True),
            StructField("pend", BinaryType(), True),
            StructField("max_r", LongType(), True),
            StructField("max_s", LongType(), True),
        ]
    )
    delta_us = None if delta is None else float(delta) * 1e6
    out_cols = [f.name for f in out_schema.fields]
    key_names = list(keys)

    def fn(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            buf_b, pend_b, max_r, max_s = state.get
            buf = pickle.loads(buf_b)
            pend = pickle.loads(pend_b)
        else:
            buf, pend, max_r, max_s = None, [], int(_NEG), int(_NEG)

        new = [p for p in pdf_iter if len(p)]
        if new:
            np_new = pd.concat(new, ignore_index=True)
            ts_us = (
                np_new[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
            )
            add = pd.DataFrame(
                {
                    "__ts": ts_us,
                    "__side": np.where(
                        np_new[side_col].to_numpy() == "r", 0, 1
                    ).astype(np.int8),
                    "__alpha": False,
                    "__beta": False,
                    ts_col: np_new[ts_col].to_numpy(),
                }
            )
            for c in payload_cols:
                add[c] = np_new[c].to_numpy()
            buf = add if buf is None else pd.concat([buf, add], ignore_index=True)
        if buf is None:
            buf = pd.DataFrame(
                columns=["__ts", "__side", "__alpha", "__beta", ts_col, *payload_cols]
            )

        buf = buf.sort_values(["__ts", "__side"], kind="mergesort").reset_index(
            drop=True
        )
        side_arr = buf["__side"].to_numpy()
        ts_arr = buf["__ts"].to_numpy()
        if len(buf):
            r_ts = ts_arr[side_arr == 0]
            s_ts = ts_arr[side_arr == 1]
            if len(r_ts):
                max_r = max(max_r, int(r_ts.max()))
            if len(s_ts):
                max_s = max(max_s, int(s_ts.max()))

        wm_us = np.int64(state.getCurrentWatermarkMs()) * 1000
        buf, pend, rows = _decide_batch(
            buf,
            pend,
            {0: np.int64(max_r), 1: np.int64(max_s)},
            wm_us,
            delta_us,
            payload_cols,
            ts_col,
        )
        state.update(
            (pickle.dumps(buf), pickle.dumps(pend), int(max_r), int(max_s))
        )
        # undecided work left → ask to be re-invoked on the next batch
        # (including no-data batches) once the watermark advances, so
        # trailing pairs flush without new input for this key
        undecided = bool(pend) or (
            len(buf) > 0
            and not bool((buf["__alpha"] & buf["__beta"]).all())
        )
        if undecided:
            state.setTimeoutTimestamp(max(int(state.getCurrentWatermarkMs()) + 1, 1))
        if rows:
            out = pd.DataFrame(rows)
            for k_name, k_val in zip(key_names, key):
                out[k_name] = k_val
            yield out[out_cols]

    return (
        df.groupBy(*keys)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )
