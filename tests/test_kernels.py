"""Kernel-level golden tests — no Spark, fast.

Transplants the reference's nine golden join counts
(reference 05_LocalStreamBuffer/tester.py:80,124,172,208,258,307,356,401,448)
onto the vectorized replay kernel, plus closure-kernel invariants.
"""

import numpy as np
import pytest

from statefulstreamprocessor_spark import fixtures as fx
from statefulstreamprocessor_spark.kernels import closure_pairs, replay_join_pairs


@pytest.mark.parametrize("make", fx.ALL_FIXTURES, ids=lambda f: f.__name__)
def test_replay_golden_counts(make):
    fix = make()
    ra, sa = fx.arrival_ranks(fix)
    ri, si = replay_join_pairs(fix.r_times, ra, fix.s_times, sa, fix.delta)
    assert len(ri) == fix.expected_replay_count


def test_unordered_golden_tuple():
    # the reference asserts one specific joined tuple by value (tester.py:209-211)
    fix = fx.unordered()
    ra, sa = fx.arrival_ranks(fix)
    ri, si = replay_join_pairs(fix.r_times, ra, fix.s_times, sa, fix.delta)
    pairs = {(fix.r_times[i], fix.s_times[j]) for i, j in zip(ri, si)}
    assert (1600000006.0, 1600000005.5) in pairs


@pytest.mark.parametrize("make", fx.ALL_FIXTURES, ids=lambda f: f.__name__)
def test_closure_superset_of_replay(make):
    # closure = replay under event-time-ordered arrival; any other arrival
    # order emits a subset (verified against the reference implementation).
    fix = make()
    ra, sa = fx.arrival_ranks(fix)
    ri, si = replay_join_pairs(fix.r_times, ra, fix.s_times, sa, fix.delta)
    ci, cj = closure_pairs(fix.r_times, fix.s_times, fix.delta)
    replay = set(zip(ri.tolist(), si.tolist()))
    closure = set(zip(ci.tolist(), cj.tolist()))
    assert replay <= closure


def test_closure_equals_replay_under_event_order():
    fix = fx.randomized_many()
    merged = sorted(
        [(t, "r") for t in fix.r_times] + [(t, "s") for t in fix.s_times]
    )
    order = [q for _, q in merged]
    fix2 = fx.JoinFixture("eventorder", fix.r_times, fix.s_times, order, None, -1)
    ra, sa = fx.arrival_ranks(fix2)
    ri, si = replay_join_pairs(fix.r_times, ra, fix.s_times, sa, None)
    ci, cj = closure_pairs(fix.r_times, fix.s_times, None)
    assert set(zip(ri.tolist(), si.tolist())) == set(zip(ci.tolist(), cj.tolist()))


def test_closure_one_sided_and_empty():
    e = np.array([])
    ri, si = closure_pairs(e, e)
    assert len(ri) == 0
    ri, si = closure_pairs(np.array([1.0, 2.0]), e)
    assert len(ri) == 0
    # single record each side → exactly one pair
    ri, si = closure_pairs(np.array([1.0]), np.array([5.0]))
    assert len(ri) == 1


def test_delta_band_filters_pairs_not_neighbors():
    # neighbors are selected ignoring delta, then filtered (reference
    # local_stream_buffer.py:366-367: the band check happens at join time)
    r = np.array([0.0, 100.0])
    s = np.array([1.0])
    ri, si = closure_pairs(r, s, delta=2.0)
    pairs = {(r[i], s[j]) for i, j in zip(ri, si)}
    assert pairs == {(0.0, 1.0)}  # (100,1) is a neighbor pair but out of band
