"""Streaming as-of enrichment (custom stateful operator).

The stream-STREAM form of J6: each left event picks the latest EARLIER
right event on the same key (backward as-of, ties inclusive) where
``streaming_enrich`` covers only the stream-static case. Spark's built-in
stream-stream joins need a bounded time-range condition; the reference's
gap-record enrichment (``local_stream_buffer.py:280-308``) has no such
bound — an arbitrary stateful operator, built here on the
:mod:`sessionize` state discipline:

* one merged input stream with a side column (``'r'`` = enrichment
  source, ``'l'`` = rows to enrich), hash-bucketed state groups;
* rows buffer until the watermark passes their event time (keep
  ``ts >= wm``, seal strictly below — the engine-wide boundary), then
  the sealed prefix is walked in (ts, side) order per key: every sealed
  left row is emitted exactly once with the latest right row at-or-before
  it, continuing across triggers and restarts via a per-key summary that
  holds ONLY the latest sealed right row (ts + right payload);
* correctness of the carry: newly sealed rows all have event time at or
  above every previously sealed row (sealing is watermark-monotonic), so
  the summary's single row per key IS the complete history a new left
  row can reach back to;
* ``state_ttl`` (seconds) bounds the summary under key churn exactly as
  in :func:`~.sessionize.streaming_sessionize`: a key idle past the TTL
  forgets its predecessor — a left row arriving after that long a
  silence enriches to NULL (trade-off documented on the batch banded
  join too);
* state round-trips as Arrow IPC typed frames; event time lives in the
  state only as integer microseconds.

Within-batch ties among right rows at one timestamp resolve to the last
row in arrival-stable sort order — the batch ``asof_join`` leaves the
same case engine-arbitrary, so parity holds whenever right timestamps
are unique per key (the oracle fixtures' property).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import BinaryType, StructField, StructType

from .sessionize import _de_frame, _ser_frame

__all__ = ["streaming_asof_enrich"]


def streaming_asof_enrich(
    df: DataFrame,
    keys: list[str] | str,
    ts_col: str,
    side_col: str,
    left_cols: list[str],
    right_cols: list[str],
    n_buckets: int | None = None,
    state_ttl: float | None = None,
    right_prefix: str = "right_",
) -> DataFrame:
    """Enrich streaming left rows with their latest earlier right row.

    ``df``: streaming DataFrame with a watermark on ``ts_col``
    (TimestampType), ``side_col`` of 'l'/'r', and the union of the two
    sides' payload columns (the unused side's columns NULL). Output, in
    append mode once the watermark passes a left row's event time:
    keys + ``ts_col`` + ``left_cols`` + ``<right_prefix><ts_col>`` +
    ``<right_prefix><c>`` for each right payload column — identical row
    set to ``asof_join(direction="backward")`` over the same data.
    """
    if isinstance(keys, str):
        keys = [keys]
    reserved = {*keys, ts_col, side_col}
    bad = reserved & {*left_cols, *right_cols}
    if bad:
        raise ValueError(
            f"left_cols/right_cols must be payload columns, not keys/"
            f"ts/side: {sorted(bad)}"
        )
    from ..shipping import ensure_package_shipped
    from .timebase import session_tz, watermark_to_naive_us

    ensure_package_shipped(df.sparkSession)
    tz_name = session_tz(df.sparkSession)
    if n_buckets is None:
        n_buckets = max(df.sparkSession.sparkContext.defaultParallelism * 8, 16)
    ttl_us = None if state_ttl is None else int(float(state_ttl) * 1_000_000)
    keys_l = list(keys)
    left_l = list(left_cols)
    right_l = list(right_cols)
    payload = list(dict.fromkeys([*left_l, *right_l]))

    out_schema = StructType(
        [df.schema[k] for k in keys_l]
        + [df.schema[ts_col]]
        + [df.schema[c] for c in left_l]
        + [
            StructField(
                f"{right_prefix}{ts_col}", df.schema[ts_col].dataType, True
            )
        ]
        + [
            StructField(f"{right_prefix}{c}", df.schema[c].dataType, True)
            for c in right_l
        ]
    )
    state_schema = StructType(
        [
            StructField("buf", BinaryType(), True),
            StructField("summ", BinaryType(), True),
        ]
    )
    out_cols = [f.name for f in out_schema.fields]
    s_cols = ["__s_ts", *[f"__s_{c}" for c in right_l]]

    def fn(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            buf_b, summ_b = state.get
            buf = _de_frame(buf_b)
            summ = _de_frame(summ_b)
        else:
            buf, summ = None, None

        # watermark in the delivered rows' naive basis (timebase module)
        wm_us = watermark_to_naive_us(
            int(state.getCurrentWatermarkMs()), tz_name
        )
        new = [p for p in pdf_iter if len(p)]
        if new:
            np_new = pd.concat(new, ignore_index=True) if len(new) > 1 else new[0]
            ts_new = (
                np_new[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
            )
            if wm_us > 0:
                keep = ts_new >= wm_us
                np_new = np_new.loc[keep].reset_index(drop=True)
                ts_new = ts_new[keep]
            if len(np_new):
                side_vals = np_new[side_col].to_numpy()
                bad = ~np.isin(side_vals, ("l", "r"))
                if bad.any():
                    raise ValueError(
                        f"streaming_asof_enrich: {side_col!r} must be "
                        f"'l'/'r'; got "
                        f"{sorted(set(map(str, side_vals[bad])))[:5]}"
                    )
                add = pd.DataFrame(
                    {
                        "__ts": ts_new,
                        # right sorts BEFORE left at equal ts (inclusive tie)
                        "__side": np.where(side_vals == "r", 0, 1).astype(
                            np.int8
                        ),
                    }
                )
                for c in (*keys_l, *payload):
                    add[c] = np_new[c].to_numpy()
                buf = add if buf is None else pd.concat(
                    [buf, add], ignore_index=True
                )

        out = None
        if buf is not None and len(buf):
            sealed_mask = buf["__ts"].to_numpy() < wm_us
            if sealed_mask.any():
                sealed = (
                    buf.loc[sealed_mask]
                    .sort_values(["__ts", "__side"], kind="mergesort")
                    .sort_values(keys_l, kind="mergesort")
                    .reset_index(drop=True)
                )
                buf = buf.loc[~sealed_mask].reset_index(drop=True)
                if summ is not None:
                    merged = sealed.merge(summ, on=keys_l, how="left")
                else:
                    merged = sealed.copy()
                    merged["__s_ts"] = np.nan
                    for c in right_l:
                        merged[f"__s_{c}"] = None
                side = merged["__side"].to_numpy()
                n = len(merged)
                ridx = np.where(side == 0, np.arange(n), -1)
                run = (
                    pd.Series(ridx)
                    .groupby(
                        [merged[k].to_numpy() for k in keys_l],
                        sort=False,
                        dropna=False,
                    )
                    .cummax()
                    .to_numpy()
                )
                is_left = side == 1
                has_in = (run >= 0) & is_left
                safe = np.clip(run, 0, None)
                ts_all = merged["__ts"].to_numpy()
                out = merged.loc[is_left, keys_l].copy()
                out[ts_col] = (
                    merged.loc[is_left, "__ts"]
                    .to_numpy()
                    .astype("datetime64[us]")
                )
                for c in left_l:
                    out[c] = merged.loc[is_left, c].to_numpy()
                rts = np.where(
                    has_in[is_left],
                    ts_all[safe][is_left].astype("float64"),
                    merged["__s_ts"].to_numpy()[is_left],
                )
                out[f"{right_prefix}{ts_col}"] = pd.to_datetime(
                    pd.Series(rts), unit="us"
                ).to_numpy()
                for c in right_l:
                    v_in = merged[c].to_numpy()[safe][is_left]
                    v_carry = merged[f"__s_{c}"].to_numpy()[is_left]
                    out[f"{right_prefix}{c}"] = np.where(
                        has_in[is_left], v_in, v_carry
                    )
                # roll the per-key summary forward: the batch's last right
                # row per key supersedes the carried one (newly sealed
                # rows are never older than previously sealed ones)
                rights = merged.loc[side == 0]
                if len(rights):
                    last_rows = rights.drop_duplicates(
                        subset=keys_l, keep="last"
                    )
                    upd = last_rows[keys_l].copy()
                    upd["__s_ts"] = last_rows["__ts"].to_numpy().astype(
                        "float64"
                    )
                    for c in right_l:
                        upd[f"__s_{c}"] = last_rows[c].to_numpy()
                    if summ is None or not len(summ):
                        summ = upd.reset_index(drop=True)
                    else:
                        untouched = (
                            summ.merge(
                                upd[keys_l], on=keys_l, how="left",
                                indicator=True,
                            )
                            .query("_merge == 'left_only'")
                            .drop(columns="_merge")
                        )
                        summ = pd.concat(
                            [untouched, upd], ignore_index=True
                        )

        if ttl_us is not None and wm_us > 0 and summ is not None and len(summ):
            live = summ["__s_ts"].to_numpy() >= float(wm_us - ttl_us)
            if not live.all():
                summ = summ.loc[live].reset_index(drop=True)

        state.update((_ser_frame(buf), _ser_frame(summ)))
        if buf is not None and len(buf):
            state.setTimeoutTimestamp(
                max(int(state.getCurrentWatermarkMs()) + 1, 1)
            )
        if out is not None and len(out):
            yield out[out_cols]

    bucketed = df.withColumn(
        "__bucket",
        F.pmod(F.xxhash64(*[F.col(k) for k in keys_l]), F.lit(n_buckets)),
    )
    return bucketed.groupBy("__bucket").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )
