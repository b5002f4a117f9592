"""Unit tests for the streaming decision kernel (no Spark) — incremental
emission must equal the batch closure for any watermark schedule."""

import numpy as np
import pandas as pd
import pytest

from statefulstreamprocessor_spark import fixtures as fx
from statefulstreamprocessor_spark.kernels import closure_pairs
from statefulstreamprocessor_spark.streaming.stateful_join import _decide

PROJ = [("r_t", "t", "r"), ("s_t", "t", "s")]


def _mk_buf(rows):
    # rows: list of (key, ts_us, side 0/1)
    df = pd.DataFrame(rows, columns=["k", "__ts", "__side"])
    df["__side"] = df["__side"].astype(np.int8)
    df["__alpha"] = False
    df["__beta"] = False
    df["t"] = df["__ts"]
    return df.sort_values(["k", "__ts", "__side"], kind="mergesort").reset_index(
        drop=True
    )


def _run_incremental(rows, wm_schedule):
    """Feed rows in arrival chunks with a watermark per step; final extra
    steps at max wm. Returns emitted (r_t, s_t) pair set."""
    buf = None
    pend = None
    emitted = set()
    for chunk, wm in wm_schedule:
        add = _mk_buf(chunk)
        buf = (
            add
            if buf is None
            else pd.concat([buf, add], ignore_index=True)
            .sort_values(["k", "__ts", "__side"], kind="mergesort")
            .reset_index(drop=True)
        )
        buf, pend, out, _ = _decide(buf, pend, wm, None, ["k"], PROJ)
        if out is not None:
            emitted |= {(r, s) for r, s in zip(out["r_t"], out["s_t"])}
    return emitted


@pytest.mark.parametrize("make", [fx.randomized, fx.five_five, fx.unordered],
                         ids=lambda f: f.__name__)
def test_incremental_equals_closure(make):
    fix = make()
    rows = sorted(
        [("k", int(t * 1e6), 0) for t in fix.r_times]
        + [("k", int(t * 1e6), 1) for t in fix.s_times],
        key=lambda x: x[1],
    )
    # feed in 4 event-time chunks, wm = previous chunk's max (Spark-style lag)
    chunks = [rows[i::1] for i in range(0)] or [
        rows[: len(rows) // 4],
        rows[len(rows) // 4 : len(rows) // 2],
        rows[len(rows) // 2 : 3 * len(rows) // 4],
        rows[3 * len(rows) // 4 :],
    ]
    wm = -(10**18)
    schedule = []
    for c in chunks:
        schedule.append((c, wm))
        if c:
            wm = max(x[1] for x in c)
    schedule.append(([], wm))  # flush batch at final watermark
    got = _run_incremental(rows, schedule)
    ci, cj = closure_pairs(fix.r_times, fix.s_times, None)
    want = {
        (int(fix.r_times[i] * 1e6), int(fix.s_times[j] * 1e6))
        for i, j in zip(ci, cj)
    }
    assert got == want


def test_incremental_tie_groups_equal_closure():
    """Quantized timestamps (cross- and same-side ties) through every
    watermark schedule cut — emitted pairs must equal the kernel set, by
    per-side index identity (catches duplicate emissions too)."""
    import random

    proj = [("r_v", "v", "r"), ("s_v", "v", "s")]

    def mk(rows):
        df = pd.DataFrame(rows, columns=["k", "__ts", "__side", "v"])
        df["__side"] = df["__side"].astype(np.int8)
        df["__alpha"] = False
        df["__beta"] = False
        df["t"] = df["__ts"]
        return df.sort_values(["k", "__ts", "__side"], kind="mergesort").reset_index(
            drop=True
        )

    random.seed(31)
    for _ in range(10):
        rt = sorted(random.randrange(0, 8) for _ in range(random.randint(1, 10)))
        st_ = sorted(random.randrange(0, 8) for _ in range(random.randint(1, 10)))
        rows = sorted(
            [("k", t * 1_000_000, 0, i) for i, t in enumerate(rt)]
            + [("k", t * 1_000_000, 1, i) for i, t in enumerate(st_)],
            key=lambda x: (x[1], x[2], x[3]),
        )
        cut = random.randint(0, len(rows))
        wm0 = -(10**18)
        wm1 = max((x[1] for x in rows[:cut]), default=wm0)
        buf, pend, emitted = None, None, []
        for chunk, wm in [(rows[:cut], wm0), (rows[cut:], wm1),
                          ([], max(x[1] for x in rows))]:
            add = mk(chunk)
            buf = (
                add if buf is None
                else pd.concat([buf, add], ignore_index=True)
                .sort_values(["k", "__ts", "__side"], kind="mergesort")
                .reset_index(drop=True)
            )
            buf, pend, out, _ = _decide(buf, pend, wm, None, ["k"], proj)
            if out is not None:
                emitted += list(zip(out["r_v"], out["s_v"]))
        ci, cj = closure_pairs(
            np.array(rt, dtype=np.float64), np.array(st_, dtype=np.float64)
        )
        want = sorted(zip(ci.tolist(), cj.tolist()))
        assert sorted(emitted) == want, (rt, st_, cut, sorted(emitted), want)


def test_state_bounded_by_retirement():
    # long interleaved stream: retained state must stay tiny per series
    n = 2000
    rows = [("k", i * 1_000_000, i % 2) for i in range(n)]
    buf = None
    pend = None
    for i in range(0, n, 100):
        add = _mk_buf(rows[i : i + 100])
        buf = (
            add
            if buf is None
            else pd.concat([buf, add], ignore_index=True)
            .sort_values(["k", "__ts", "__side"], kind="mergesort")
            .reset_index(drop=True)
        )
        wm = rows[max(i - 1, 0)][1]
        buf, pend, _out, _ = _decide(buf, pend, wm, None, ["k"], PROJ)
        assert len(buf) <= 220, f"state not bounded: {len(buf)}"
    assert pend is None or len(pend) <= 4
