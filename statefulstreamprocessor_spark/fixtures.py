"""Deterministic golden fixtures transplanted from the reference test corpus.

Each fixture reproduces the exact record sets + arrival interleavings of
``05_LocalStreamBuffer/tester.py`` (reference), so the engine's replay join
can be asserted against the reference's published golden join counts
(tester.py:80,124,172,208,258,307,356,401,448). Generation uses the same
seeded ``random`` sequences the reference tests use — this is a test-fixture
specification, not engine code.

A fixture is ``(r_times, s_times, arrival)`` where arrival is the list of
sides in global arrival order (within-side arrival is event-time order, the
reference's per-stream in-order assumption).
"""

from __future__ import annotations

import random
from dataclasses import dataclass

START_TIME = 1600000000


@dataclass(frozen=True)
class JoinFixture:
    name: str
    r_times: list[float]
    s_times: list[float]
    arrival: list[str]  # "r"/"s" per global arrival slot
    delta: float | None
    expected_replay_count: int  # the reference's golden assert


def _interleave(n: int, block: int) -> tuple[list[float], list[float], list[str]]:
    random.seed(0)
    order = (["r"] * block + ["s"] * block) * (n // (2 * block))
    r, s = [], []
    for i, q in enumerate(order):
        random.random()  # reference draws a result value per record
        (r if q == "r" else s).append(float(i + START_TIME))
    return r, s, order


def _random_walk(n: int) -> tuple[list[float], list[float], list[str]]:
    random.seed(0)
    r, s = [], []
    t = float(START_TIME)
    for _ in range(n):
        t += random.random()
        r.append(t)
        random.random()  # result draw
    t = float(START_TIME)
    for _ in range(n):
        t += random.random()
        s.append(t)
        random.random()
    order = ["r"] * n + ["s"] * n
    random.shuffle(order)
    return r, s, order


def one_one() -> JoinFixture:
    r, s, order = _interleave(100, 1)
    return JoinFixture("one_one", r, s, order, None, 99)


def five_five() -> JoinFixture:
    r, s, order = _interleave(20, 5)
    return JoinFixture("five_five", r, s, order, None, 23)


def five_five_many() -> JoinFixture:
    r, s, order = _interleave(100_000, 5)
    return JoinFixture("five_five_many", r, s, order, None, 179_987)


def unordered() -> JoinFixture:
    random.seed(0)
    r = []
    for i in range(10):
        r.append(float(i + START_TIME))
        random.random()
    s = [START_TIME - 0.5, START_TIME + 0.5, START_TIME + 5.5, START_TIME + 9.5]
    return JoinFixture("unordered", r, s, ["r"] * 10 + ["s"] * 4, None, 20)


def randomized() -> JoinFixture:
    r, s, order = _random_walk(10)
    return JoinFixture("randomized", r, s, order, None, 20)


def randomized_many() -> JoinFixture:
    r, s, order = _random_walk(10_000)
    return JoinFixture("randomized_many", r, s, order, None, 23_041)


def delayed_many() -> JoinFixture:
    # stream s lags by 100 records; the reference loop stops once either
    # stream is exhausted (tester.py:339), so s ingests only 4,895 records.
    n = 10_000
    r, s, base = _interleave(n, 5)
    order = ["r"] * 100 + base
    n_r = n_s = 0
    taken: list[str] = []
    while n_r < len(r) and n_s < len(s):
        q = order[n_r + n_s]
        taken.append(q)
        if q == "r":
            n_r += 1
        else:
            n_s += 1
    return JoinFixture("delayed_many", r[:n_r], s[:n_s], taken, None, 13_702)


def timeout_five_five() -> JoinFixture:
    r, s, order = _interleave(20, 5)
    return JoinFixture("timeout_five_five", r, s, order, 3.0, 13)


def timeout_randomized() -> JoinFixture:
    r, s, order = _random_walk(10)
    return JoinFixture("timeout_randomized", r, s, order, 0.5, 16)


ALL_FIXTURES = [
    one_one,
    five_five,
    five_five_many,
    unordered,
    randomized,
    randomized_many,
    delayed_many,
    timeout_five_five,
    timeout_randomized,
]


def arrival_ranks(fix: JoinFixture) -> tuple[list[int], list[int]]:
    """Global arrival rank per record, split by side, in event-time order."""
    ra, sa = [], []
    for i, q in enumerate(fix.arrival):
        (ra if q == "r" else sa).append(i)
    return ra, sa
