"""Vectorized (numpy) kernels for the pairwise nearest-neighbor time-series join.

Two semantics are provided, both derived from the observable behavior of the
reference engine (reference: ``05_LocalStreamBuffer/local_stream_buffer.py``,
join cases JR1/JR2/JS2 at lines 260-308, buffer retirement at 317-350):

1. ``closure_pairs`` — the *deterministic closure*: the pair set the reference
   emits when records arrive in global event-time order. It is invariant to
   cross-stream arrival order (the guarantee the reference README:219-233
   advertises; the reference itself only approximates it — see
   ``replay_pairs``). For each record x, pair with the earliest other-side
   record at-or-after x ("alpha"); for each record y that has some other-side
   record at-or-after it, pair with the latest other-side record at-or-before
   y ("beta"). Dedup, then apply the |dt| <= delta band (reference
   ``local_stream_buffer.py:366-367``).

2. ``replay_pairs_one_side`` / ``replay_join_pairs`` — *exact arrival-order
   replay*: reproduces the reference's emitted pair set for any arrival
   interleaving, given a global arrival rank per record. Derived mechanisms
   (x = earlier record on side X, y = later record on side Y):

   - E1 (reference JR2, lines 280-294): on y's arrival, y joins every already
     arrived X-record in the event-time gap (pred_Y(y).t, y.t].
   - E2 (reference JS2, lines 296-308): on x's arrival, x joins the earliest
     already-arrived Y-record with t >= x.t.
   - E3 (reference JR1, lines 260-278): on arrival of x's within-side
     successor w, x joins every already-arrived Y-record in (x.t, w.t]
     except the earliest one (which E2/E1 already covered).

   Buffer retirement (J4) is pure garbage collection — it provably never
   suppresses an emission — so the replay set needs only event times and
   arrival ranks. Validated against the reference implementation on the nine
   golden fixtures of ``05_LocalStreamBuffer/tester.py`` and on 60 randomized
   arrival shuffles.

Both kernels assume per-side event-time-ordered input (the reference's
in-order-per-stream assumption, README:220-230) and are O(n log n), fully
vectorized; outputs are index pairs into the (sorted) side arrays.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "closure_pairs",
    "replay_join_pairs",
    "expand_ranges",
]


def expand_ranges(starts: np.ndarray, stops: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Expand per-row [start, stop) index ranges into (row_idx, flat_idx) pairs.

    Returns (owner, member) where owner[i] is the row that produced
    member[i] ∈ [starts[owner[i]], stops[owner[i]]).
    """
    counts = np.maximum(stops - starts, 0)
    total = int(counts.sum())
    if total == 0:
        empty = np.empty(0, dtype=np.int64)
        return empty, empty
    owner = np.repeat(np.arange(len(starts), dtype=np.int64), counts)
    # member = start[owner] + intra-range offset
    offsets = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    member = starts[owner] + offsets
    return owner, member


def _closure_one_direction(
    xt: np.ndarray, yt: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Pairs (x_idx, y_idx) of the closure semantics, one side at a time.

    alpha: (x, first y with y.t >= x.t)
    beta:  (last x with x.t <= y.t, y) for y that has some x with x.t >= y.t
    Both sides' alpha/beta are unioned by the caller; dedup happens there.
    """
    nx, ny = len(xt), len(yt)
    out_x: list[np.ndarray] = []
    out_y: list[np.ndarray] = []
    if nx and ny:
        # alpha from X: next Y at-or-after each x
        nxt = np.searchsorted(yt, xt, side="left")
        m = nxt < ny
        out_x.append(np.nonzero(m)[0].astype(np.int64))
        out_y.append(nxt[m].astype(np.int64))
        # beta to Y: prev X at-or-before y, needs next X at-or-after y to exist
        prv = np.searchsorted(xt, yt, side="right") - 1
        has_next_x = np.searchsorted(xt, yt, side="left") < nx
        m = (prv >= 0) & has_next_x
        out_x.append(prv[m].astype(np.int64))
        out_y.append(np.nonzero(m)[0].astype(np.int64))
    if not out_x:
        e = np.empty(0, dtype=np.int64)
        return e, e
    return np.concatenate(out_x), np.concatenate(out_y)


def _dedup_and_band(
    xi: np.ndarray,
    yi: np.ndarray,
    xt: np.ndarray,
    yt: np.ndarray,
    ny: int,
    delta: float | None,
) -> tuple[np.ndarray, np.ndarray]:
    if len(xi) == 0:
        return xi, yi
    packed = xi * np.int64(max(ny, 1)) + yi
    _, keep = np.unique(packed, return_index=True)
    xi, yi = xi[keep], yi[keep]
    if delta is not None:
        m = np.abs(xt[xi] - yt[yi]) <= delta
        xi, yi = xi[m], yi[m]
    return xi, yi


def closure_pairs(
    rt: np.ndarray, st: np.ndarray, delta: float | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic-closure nearest-neighbor pairs between sides R and S.

    Parameters: rt, st — event times, each sorted ascending (float seconds or
    int64 epoch-micros; dtype is preserved to avoid float rounding of large
    epochs). delta — optional max |r.t - s.t| band in the same unit (None =
    unbounded, reference default). Returns (r_idx, s_idx), deduped, filtered.
    """
    rt = np.asarray(rt)
    st = np.asarray(st)
    a_r, a_s = _closure_one_direction(rt, st)  # x-side = R
    b_s, b_r = _closure_one_direction(st, rt)  # x-side = S (swapped roles)
    ri = np.concatenate([a_r, b_r])
    si = np.concatenate([a_s, b_s])
    return _dedup_and_band(ri, si, rt, st, len(st), delta)


def _replay_one_direction(
    xt: np.ndarray, xa: np.ndarray, yt: np.ndarray, ya: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Replay pairs (x earlier on side X, y later on side Y).

    xt/yt: event times sorted ascending per side. xa/ya: global arrival
    ranks (strictly increasing within each side — the reference's in-order-
    per-stream assumption means arrival order == event order within a side).
    """
    nx, ny = len(xt), len(yt)
    e = np.empty(0, dtype=np.int64)
    if nx == 0 or ny == 0:
        return e, e
    outs: list[tuple[np.ndarray, np.ndarray]] = []

    # E1 [JR2@y]: x in event gap (pred_Y(y).t, y.t), arrived before y.
    # "arrived before y" clips the x-range to the arrival prefix of X.
    pred_yt = np.empty_like(yt)
    pred_yt[0] = (
        np.finfo(yt.dtype).min if yt.dtype.kind == "f" else np.iinfo(yt.dtype).min
    )
    pred_yt[1:] = yt[:-1]
    gap_lo = np.searchsorted(xt, pred_yt, side="right")
    gap_hi = np.searchsorted(xt, yt, side="left")
    kx = np.searchsorted(xa, ya)  # #X arrived before each y
    owner_y, xi = expand_ranges(gap_lo, np.minimum(gap_hi, kx))
    outs.append((xi, owner_y))

    # E2 [JS2@x]: y = earliest-arrived Y with t >= x.t at x's arrival; the
    # arrived set is an event-time prefix of Y, so it is the searchsorted hit
    # iff that index lies inside the prefix.
    j = np.searchsorted(yt, xt, side="left")
    ky = np.searchsorted(ya, xa)  # #Y arrived before each x
    m = j < ky
    outs.append((np.nonzero(m)[0].astype(np.int64), j[m].astype(np.int64)))

    # E3 [JR1@w]: w = within-side successor of x; y in (x.t, w.t], arrived
    # before w, skipping the earliest such y (reference's advance-one at
    # local_stream_buffer.py:271-272).
    if nx >= 2:
        j0 = np.searchsorted(yt, xt[:-1], side="right")
        j1 = np.searchsorted(yt, xt[1:], side="right")
        kw = np.searchsorted(ya, xa[1:])  # #Y arrived before w
        owner_x, yi = expand_ranges(j0 + 1, np.minimum(j1, kw))
        outs.append((owner_x, yi))

    xi = np.concatenate([o[0] for o in outs])
    yi = np.concatenate([o[1] for o in outs])
    return xi, yi


def replay_join_pairs(
    rt: np.ndarray,
    ra: np.ndarray,
    st: np.ndarray,
    sa: np.ndarray,
    delta: float | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact reference-parity pairs for a given arrival interleaving.

    rt/st: per-side event times sorted ascending; ra/sa: global arrival ranks
    (each strictly increasing). Returns (r_idx, s_idx), deduped, band-filtered.
    """
    rt = np.asarray(rt)
    st = np.asarray(st)
    ra = np.asarray(ra, dtype=np.int64)
    sa = np.asarray(sa, dtype=np.int64)
    x_r, y_s = _replay_one_direction(rt, ra, st, sa)  # r earlier
    x_s, y_r = _replay_one_direction(st, sa, rt, ra)  # s earlier
    ri = np.concatenate([x_r, y_r])
    si = np.concatenate([y_s, x_s])
    return _dedup_and_band(ri, si, rt, st, len(st), delta)
