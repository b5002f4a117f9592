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


def _run_incremental(rows, wm_schedule, in_order=False):
    """Feed rows in arrival chunks with a watermark per step; final extra
    steps at max wm. Returns emitted (r_t, s_t) pair set."""
    buf = None
    pend = None
    emitted = []
    for chunk, wm in wm_schedule:
        add = _mk_buf(chunk)
        buf = (
            add
            if buf is None
            else pd.concat([buf, add], ignore_index=True)
            .sort_values(["k", "__ts", "__side"], kind="mergesort")
            .reset_index(drop=True)
        )
        buf, pend, out, _ = _decide(
            buf, pend, wm, None, ["k"], PROJ, in_order=in_order
        )
        if out is not None:
            emitted += list(zip(out["r_t"], out["s_t"]))
    assert len(emitted) == len(set(emitted)), "duplicate emission"
    return set(emitted)


@pytest.mark.parametrize("in_order", [False, True], ids=["wm", "in_order"])
@pytest.mark.parametrize("make", [fx.randomized, fx.five_five, fx.unordered],
                         ids=lambda f: f.__name__)
def test_incremental_equals_closure(make, in_order):
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
    got = _run_incremental(rows, schedule, in_order=in_order)
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


def test_in_order_mode_emits_before_watermark():
    """Eager finality: with in-order arrival, interior pairs are emitted in
    the same batch the data lands — not one watermark update later."""
    rows = [("k", i * 1_000_000, i % 2) for i in range(10)]
    buf = _mk_buf(rows)
    # watermark still at -inf: wm mode emits nothing, in-order mode emits
    # everything except the per-series tail
    b1, p1, out_wm, _ = _decide(buf.copy(), None, -(10**18), None, ["k"], PROJ)
    assert out_wm is None
    b2, p2, out_eager, _ = _decide(
        buf.copy(), None, -(10**18), None, ["k"], PROJ, in_order=True
    )
    # alternating sides: the full closure is 9 pairs (every beta duplicates
    # an alpha) — all emitted in the very first batch
    assert out_eager is not None and len(out_eager) == 9
    # and state already retired to the tails (+ pinned lookups)
    assert len(b2) < len(b1)


def test_in_order_mode_tie_groups_equal_closure():
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

    random.seed(37)
    for _ in range(8):
        rt = sorted(random.randrange(0, 8) for _ in range(random.randint(1, 10)))
        st_ = sorted(random.randrange(0, 8) for _ in range(random.randint(1, 10)))
        rows = sorted(
            [("k", t * 1_000_000, 0, i) for i, t in enumerate(rt)]
            + [("k", t * 1_000_000, 1, i) for i, t in enumerate(st_)],
            key=lambda x: (x[1], x[2], x[3]),
        )
        cut = random.randint(0, len(rows))
        # time-ordered cut => in-order per series across chunks
        buf, pend, emitted = None, None, []
        wm = -(10**18)
        for chunk, w in [(rows[:cut], wm), (rows[cut:], wm),
                         ([], max(x[1] for x in rows))]:
            add = mk(chunk)
            buf = (
                add if buf is None
                else pd.concat([buf, add], ignore_index=True)
                .sort_values(["k", "__ts", "__side"], kind="mergesort")
                .reset_index(drop=True)
            )
            buf, pend, out, _ = _decide(
                buf, pend, w, None, ["k"], proj, in_order=True
            )
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
