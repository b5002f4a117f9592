"""Token-window chunking with overlap (operators/chunking.py)."""

from __future__ import annotations

import pytest

from statefulstreamprocessor_spark.operators.chunking import chunk_documents


@pytest.fixture(scope="module")
def spark():
    from statefulstreamprocessor_spark.session import get_spark

    return get_spark("chunking-tests", master="local[4]", shuffle_partitions=8)


def _df(spark, docs):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id bigint, text string"
    )


def _chunks(spark, docs, chunk, overlap=0):
    out = chunk_documents(
        _df(spark, docs), "text", "doc_id", chunk, overlap
    ).collect()
    got: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["id"], r["chunk_id"])):
        got.setdefault(r["id"], []).append(
            (r["chunk_id"], r["start_token"], r["chunk_text"], r["n_tokens"])
        )
    return got


def test_exact_multiple_no_overlap(spark):
    got = _chunks(spark, ["a b c d e f"], chunk=3)
    assert got[0] == [(0, 0, "a b c", 3), (1, 3, "d e f", 3)]


def test_overlap_with_pulled_back_tail(spark):
    # n=10, chunk=5, overlap=2 -> stride 3; full starts 0,3; tail 3+5=8 < 10
    # -> pulled-back tail start at 5. Every token covered, all full-width.
    toks = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    got = _chunks(spark, [toks], chunk=5, overlap=2)
    assert [c[1] for c in got[0]] == [0, 3, 5]
    assert got[0][2][2] == "t5 t6 t7 t8 t9"
    assert all(c[3] == 5 for c in got[0])


def test_aligned_tail_not_duplicated(spark):
    # n=7, chunk=3, overlap=1 -> stride 2; starts 0,2,4 cover to token 7
    # exactly: no extra tail chunk
    got = _chunks(spark, ["a b c d e f g"], chunk=3, overlap=1)
    assert [c[1] for c in got[0]] == [0, 2, 4]


def test_short_and_empty_docs(spark):
    got = _chunks(spark, ["a b", "", None, "   "], chunk=5, overlap=2)
    assert got.get(0) == [(0, 0, "a b", 2)]
    assert 1 not in got and 2 not in got and 3 not in got


def test_whitespace_normalized(spark):
    got = _chunks(spark, ["a\n\nb\tc   d"], chunk=4)
    assert got[0] == [(0, 0, "a b c d", 4)]


def test_validation(spark):
    df = _df(spark, ["a"])
    with pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", 0)
    with pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", 4, 4)


def test_zero_exchange_plan(spark):
    """Chunking is per-row: the physical plan must contain no Exchange
    and no Join — posexplode amplifies in place."""
    df = _df(spark, ["a b c d e f g h"] * 10)
    plan = (
        chunk_documents(df, "text", "doc_id", 4, 1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
