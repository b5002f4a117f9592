"""Spark-level tests for the closure and replay join operators.

Mirrors the reference's golden-count test strategy
(reference 05_LocalStreamBuffer/tester.py) through the actual Spark
operators, plus multi-key and oracle cross-checks.
"""

import random

import pytest
from pyspark.sql import functions as F

from statefulstreamprocessor_spark import fixtures as fx
from statefulstreamprocessor_spark.kernels import closure_pairs
from statefulstreamprocessor_spark.operators import nn_join, replay_join

SMALL = [fx.one_one, fx.five_five, fx.unordered, fx.randomized,
         fx.timeout_five_five, fx.timeout_randomized]
BIG = [fx.five_five_many, fx.randomized_many, fx.delayed_many]


def _fixture_dfs(spark, fix):
    ra, sa = fx.arrival_ranks(fix)
    rows_r = [("k1", t, a, float(i)) for i, (t, a) in enumerate(zip(fix.r_times, ra))]
    rows_s = [("k1", t, a, float(i)) for i, (t, a) in enumerate(zip(fix.s_times, sa))]
    cols = ["key", "ts", "arrival", "val"]
    return spark.createDataFrame(rows_r, cols), spark.createDataFrame(rows_s, cols)


@pytest.mark.parametrize("make", SMALL, ids=lambda f: f.__name__)
def test_replay_join_golden_small(spark, make):
    fix = make()
    df_r, df_s = _fixture_dfs(spark, fix)
    out = replay_join(df_r, df_s, "key", "ts", "arrival", fix.delta)
    assert out.count() == fix.expected_replay_count


@pytest.mark.parametrize("make", BIG, ids=lambda f: f.__name__)
def test_replay_join_golden_big(spark, make):
    fix = make()
    df_r, df_s = _fixture_dfs(spark, fix)
    out = replay_join(df_r, df_s, "key", "ts", "arrival", fix.delta)
    assert out.count() == fix.expected_replay_count


def test_replay_join_golden_tuple(spark):
    # reference tester.py:209-211 asserts this exact joined row by value
    fix = fx.unordered()
    df_r, df_s = _fixture_dfs(spark, fix)
    out = replay_join(df_r, df_s, "key", "ts", "arrival", fix.delta)
    hit = out.filter(
        (F.col("r_ts") == 1600000006.0) & (F.col("s_ts") == 1600000005.5)
    )
    assert hit.count() == 1


@pytest.mark.parametrize("make", SMALL + [fx.randomized_many], ids=lambda f: f.__name__)
def test_nn_join_matches_closure_kernel(spark, make):
    fix = make()
    df_r, df_s = _fixture_dfs(spark, fix)
    out = nn_join(
        df_r.drop("arrival"), df_s.drop("arrival"), "key", "ts", fix.delta
    )
    got = {(r["r_ts"], r["s_ts"]) for r in out.collect()}
    ci, cj = closure_pairs(fix.r_times, fix.s_times, fix.delta)
    want = {(fix.r_times[i], fix.s_times[j]) for i, j in zip(ci, cj)}
    assert got == want


def test_nn_join_multi_key(spark):
    # independent keys must not interact; compare per-key against the kernel
    random.seed(7)
    rows_r, rows_s = [], []
    per_key = {}
    for k in ["a", "b", "c"]:
        rt, st_ = [], []
        t = 0.0
        for _ in range(random.randint(3, 40)):
            t += random.random()
            rt.append(t)
        t = 0.0
        for _ in range(random.randint(3, 40)):
            t += random.random()
            st_.append(t)
        per_key[k] = (rt, st_)
        rows_r += [(k, t, 0.0) for t in rt]
        rows_s += [(k, t, 0.0) for t in st_]
    df_r = spark.createDataFrame(rows_r, ["key", "ts", "val"])
    df_s = spark.createDataFrame(rows_s, ["key", "ts", "val"])
    out = nn_join(df_r, df_s, "key", "ts", delta=1.5)
    got = {(r["key"], r["r_ts"], r["s_ts"]) for r in out.collect()}
    want = set()
    for k, (rt, st_) in per_key.items():
        ci, cj = closure_pairs(rt, st_, 1.5)
        want |= {(k, rt[i], st_[j]) for i, j in zip(ci, cj)}
    assert got == want


def test_nn_join_output_schema(spark):
    fix = fx.five_five()
    df_r, df_s = _fixture_dfs(spark, fix)
    out = nn_join(df_r.drop("arrival"), df_s.drop("arrival"), "key", "ts")
    assert out.columns == ["key", "r_ts", "r_val", "s_ts", "s_val"]


def test_nn_join_empty_side(spark):
    df_r = spark.createDataFrame([("k", 1.0, 1.0)], ["key", "ts", "val"])
    df_s = spark.createDataFrame([], "key string, ts double, val double")
    assert nn_join(df_r, df_s, "key", "ts").count() == 0
    assert replay_join(
        df_r.withColumn("arrival", F.lit(0)),
        df_s.withColumn("arrival", F.lit(0)),
        "key", "ts", "arrival",
    ).count() == 0


def test_nn_join_tiebreak_deterministic(spark):
    """Equal timestamps: the tiebreak column makes the total order — and
    therefore the pair set — deterministic across runs/partitionings."""
    rows_r = [("k", 10.0, 1, 1.0), ("k", 10.0, 2, 2.0)]
    rows_s = [("k", 10.0, 3, 3.0), ("k", 20.0, 4, 4.0)]
    df_r = spark.createDataFrame(rows_r, ["key", "ts", "seq", "val"])
    df_s = spark.createDataFrame(rows_s, ["key", "ts", "seq", "val"])
    outs = set()
    for _ in range(3):
        out = nn_join(df_r, df_s, "key", "ts", tiebreak="seq")
        outs.add(
            frozenset((r["r_seq"], r["s_seq"]) for r in out.collect())
        )
    assert len(outs) == 1


def test_nn_join_banded_equals_plain(spark):
    """The hot-series banded variant must emit exactly the plain
    delta-banded closure, for several chunk widths."""
    from statefulstreamprocessor_spark.operators.nn_join import nn_join_banded

    random.seed(11)
    rows_r, rows_s = [], []
    for k in ["a", "b"]:
        t = 0.0
        for _ in range(60):
            t += random.random() * 4
            rows_r.append((k, t, random.random()))
        t = 0.0
        for _ in range(60):
            t += random.random() * 4
            rows_s.append((k, t, random.random()))
    df_r = spark.createDataFrame(rows_r, ["key", "ts", "val"])
    df_s = spark.createDataFrame(rows_s, ["key", "ts", "val"])
    for delta, chunk in [(3.0, None), (3.0, 7.5), (0.5, None), (10.0, None)]:
        want = {
            (r["key"], r["r_ts"], r["s_ts"])
            for r in nn_join(df_r, df_s, "key", "ts", delta=delta).collect()
        }
        got = {
            (r["key"], r["r_ts"], r["s_ts"])
            for r in nn_join_banded(
                df_r, df_s, "key", "ts", delta=delta, chunk_seconds=chunk
            ).collect()
        }
        assert got == want, f"delta={delta} chunk={chunk}: " \
            f"missing={len(want-got)} extra={len(got-want)}"


def test_nn_join_banded_parallelizes_hot_key(spark):
    """One hot key spread over many time buckets → many partitions of work."""
    from statefulstreamprocessor_spark.operators.nn_join import nn_join_banded

    rows = [("hot", float(i), float(i)) for i in range(2000)]
    df_r = spark.createDataFrame(rows[0::2], ["key", "ts", "val"])
    df_s = spark.createDataFrame(rows[1::2], ["key", "ts", "val"])
    out = nn_join_banded(df_r, df_s, "key", "ts", delta=5.0)
    n = out.count()
    want = nn_join(df_r, df_s, "key", "ts", delta=5.0).count()
    assert n == want
