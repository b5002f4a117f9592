"""Property-based tests (hypothesis) for the join kernels.

The closure/replay kernels were validated against the reference
implementation once (60 randomized trials + golden fixtures); these
properties pin the invariants they satisfy so any kernel change that
breaks them fails fast — without needing the reference at test time.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from statefulstreamprocessor_spark.kernels import closure_pairs, replay_join_pairs

# strictly increasing tie-free times per side
times = st.lists(
    st.floats(min_value=0.001, max_value=100.0, allow_nan=False), min_size=0,
    max_size=30,
).map(lambda xs: np.cumsum(np.array(sorted(set(xs)), dtype=np.float64)))


@st.composite
def two_sides_with_arrival(draw):
    rt = draw(times)
    st_ = draw(times) + 0.0005  # avoid cross-side ties
    order = draw(st.permutations(list(range(len(rt) + len(st_)))))
    ra = sorted(order[: len(rt)])
    sa = sorted(order[len(rt) :])
    return rt, np.array(ra), st_, np.array(sa)


@given(two_sides_with_arrival())
@settings(max_examples=200, deadline=None)
def test_replay_subset_of_closure(data):
    rt, ra, st_, sa = data
    ri, si = replay_join_pairs(rt, ra, st_, sa)
    ci, cj = closure_pairs(rt, st_)
    assert set(zip(ri.tolist(), si.tolist())) <= set(zip(ci.tolist(), cj.tolist()))


@given(two_sides_with_arrival())
@settings(max_examples=100, deadline=None)
def test_event_order_arrival_equals_closure(data):
    rt, _ra, st_, _sa = data
    merged = sorted([(t, 0, i) for i, t in enumerate(rt)]
                    + [(t, 1, i) for i, t in enumerate(st_)])
    ra = [rank for rank, (_t, side, _i) in enumerate(merged) if side == 0]
    sa = [rank for rank, (_t, side, _i) in enumerate(merged) if side == 1]
    ri, si = replay_join_pairs(rt, np.array(ra), st_, np.array(sa))
    ci, cj = closure_pairs(rt, st_)
    assert set(zip(ri.tolist(), si.tolist())) == set(zip(ci.tolist(), cj.tolist()))


@given(two_sides_with_arrival(), st.floats(min_value=0.01, max_value=50.0))
@settings(max_examples=100, deadline=None)
def test_delta_is_a_filter_not_a_reselection(data, delta):
    # reference semantics: the band check happens at join time, never when
    # choosing neighbors (local_stream_buffer.py:366-367)
    rt, ra, st_, sa = data
    ri, si = replay_join_pairs(rt, ra, st_, sa, None)
    all_pairs = set(zip(ri.tolist(), si.tolist()))
    ri2, si2 = replay_join_pairs(rt, ra, st_, sa, delta)
    banded = set(zip(ri2.tolist(), si2.tolist()))
    expect = {
        (i, j) for i, j in all_pairs if abs(rt[i] - st_[j]) <= delta
    }
    assert banded == expect


@given(two_sides_with_arrival())
@settings(max_examples=100, deadline=None)
def test_closure_pair_counts_and_membership(data):
    rt, _ra, st_, _sa = data
    ci, cj = closure_pairs(rt, st_)
    pairs = set(zip(ci.tolist(), cj.tolist()))
    assert len(pairs) == len(ci)  # deduped
    if len(rt) and len(st_):
        # every record with a forward partner appears in some pair
        for i, t in enumerate(rt):
            if (st_ >= t).any():
                assert any(p[0] == i for p in pairs)
        # interleave cardinality bound: |R|+|S|-1 when fully interleaved,
        # never more than 2(|R|+|S|)
        assert len(pairs) <= 2 * (len(rt) + len(st_))
