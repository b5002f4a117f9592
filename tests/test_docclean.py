"""Document-structure cleaning: global paragraph dedup + boilerplate
line removal (operators/docclean.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from statefulstreamprocessor_spark.operators.docclean import (
    dedup_paragraphs,
    remove_boilerplate_lines,
)


@pytest.fixture(scope="module")
def spark():
    from statefulstreamprocessor_spark.session import get_spark

    return get_spark("docclean-tests", master="local[4]", shuffle_partitions=8)


def _rows(spark, docs):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id bigint, text string"
    )


def test_dedup_paragraphs_first_global_occurrence(spark):
    docs = [
        "alpha\n\nshared\n\nbeta",      # doc 0: first 'shared'
        "shared\n\ngamma",              # doc 1: 'shared' dropped
        "delta\n\nshared\n\nshared",    # doc 2: both copies dropped
    ]
    out = {
        r["id"]: r
        for r in dedup_paragraphs(_rows(spark, docs), "text", "doc_id").collect()
    }
    assert out[0]["text"] == "alpha\n\nshared\n\nbeta"
    assert (out[0]["n_kept"], out[0]["n_dropped"]) == (3, 0)
    assert out[1]["text"] == "gamma"
    assert (out[1]["n_kept"], out[1]["n_dropped"]) == (1, 1)
    assert out[2]["text"] == "delta"
    assert (out[2]["n_kept"], out[2]["n_dropped"]) == (1, 2)


def test_dedup_paragraphs_within_doc_first_kept(spark):
    # duplicate inside ONE document: smallest pos wins
    out = dedup_paragraphs(
        _rows(spark, ["x\n\ny\n\nx"]), "text", "doc_id"
    ).collect()
    assert out[0]["text"] == "x\n\ny"
    assert (out[0]["n_kept"], out[0]["n_dropped"]) == (2, 1)


def test_dedup_paragraphs_empty_segments_and_order(spark):
    # doubled/trailing separators produce empty segments — dropped, and
    # reassembly preserves original paragraph order
    out = dedup_paragraphs(
        _rows(spark, ["c\n\n\n\na\n\nb\n\n"]), "text", "doc_id",
        sep_regex=r"\n\n"
    ).collect()
    assert out[0]["text"].split("\n\n") == ["c", "a", "b"]


def test_cleaning_preserves_corpus_cardinality(spark):
    """A document whose text yields zero non-empty segments (NULL, '',
    separators only) must still come out — as text='' with zero counts —
    never silently vanish from the cleaned corpus."""
    df = spark.createDataFrame(
        [(0, "real\n\ncontent"), (1, None), (2, ""), (3, "\n\n\n\n")],
        "doc_id bigint, text string",
    )
    out = {
        r["id"]: (r["text"], r["n_kept"], r["n_dropped"])
        for r in dedup_paragraphs(df, "text", "doc_id").collect()
    }
    assert set(out) == {0, 1, 2, 3}
    assert out[0] == ("real\n\ncontent", 2, 0)
    for i in (1, 2, 3):
        assert out[i] == ("", 0, 0), i
    out2 = {
        r["id"]
        for r in remove_boilerplate_lines(
            df.withColumn("text", F.coalesce("text", F.lit(""))),
            "text", "doc_id", max_df=10,
        ).collect()
    }
    assert out2 == {0, 1, 2, 3}


def test_remove_boilerplate_lines_df_threshold(spark):
    nav = "HOME | ABOUT | CONTACT"
    docs = [f"{nav}\ncontent {i}\n{nav}" for i in range(4)] + ["rare\nunique"]
    out = {
        r["id"]: r
        for r in remove_boilerplate_lines(
            _rows(spark, docs), "text", "doc_id", max_df=3
        ).collect()
    }
    # nav occurs (twice) in 4 docs > max_df=3 -> dropped everywhere,
    # including both within-doc copies
    for i in range(4):
        assert out[i]["text"] == f"content {i}"
        assert (out[i]["n_kept"], out[i]["n_dropped"]) == (1, 2)
    assert out[4]["text"] == "rare\nunique"
    assert (out[4]["n_kept"], out[4]["n_dropped"]) == (2, 0)


def test_remove_boilerplate_lines_at_threshold_kept(spark):
    # exactly max_df distinct docs is NOT boilerplate (strict >)
    docs = ["k\na", "k\nb", "k\nc"]
    out = {
        r["id"]: r["text"]
        for r in remove_boilerplate_lines(
            _rows(spark, docs), "text", "doc_id", max_df=3
        ).collect()
    }
    assert out == {0: "k\na", 1: "k\nb", 2: "k\nc"}


def test_paragraph_dedup_no_window_on_hash(spark):
    """Winner selection must be the min(struct) AGGREGATE joined back —
    never a window partitioned by the paragraph hash (a viral duplicate
    would put its whole occurrence set in one window partition). The
    whole plan is window-free: reassembly is an aggregation too."""
    df = _rows(spark, [f"p{i % 7}\n\nq{i}" for i in range(30)])
    plan = (
        dedup_paragraphs(df, "text", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan
    assert "HashAggregate" in plan, plan


def test_boilerplate_broadcast_anti_shape(spark):
    """The corpus-side filter must be a broadcast join (the boilerplate
    set is bounded by total_lines/max_df); the corpus rows shuffle only
    for the reassembly groupBy(id)."""
    df = _rows(spark, [f"line{i}\ncommon" for i in range(20)])
    plan = (
        remove_boilerplate_lines(df, "text", "doc_id", max_df=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan


# ---------------------------------------------------------------------------
# remove_duplicate_spans (C4 three-sentence-span rule)
# ---------------------------------------------------------------------------


def test_duplicate_spans_basic_winner_keeps_all(spark):
    from statefulstreamprocessor_spark.operators.docclean import (
        remove_duplicate_spans,
    )

    # docs 0 and 1 share the 3-line span (sA, sB, sC); doc 0's occurrence
    # is the global-first (smaller id) so doc 0 keeps everything and doc 1
    # loses exactly the three covered lines
    docs = [
        "u0\nsA\nsB\nsC\nv0",
        "u1\nsA\nsB\nsC\nv1",
        "solo\nlines\nonly",
    ]
    out = {
        r["id"]: r
        for r in remove_duplicate_spans(
            _rows(spark, docs), "text", "doc_id", k=3
        ).collect()
    }
    assert out[0]["text"] == docs[0]
    assert (out[0]["n_kept"], out[0]["n_dropped"]) == (5, 0)
    assert out[1]["text"] == "u1\nv1"
    assert (out[1]["n_kept"], out[1]["n_dropped"]) == (2, 3)
    assert out[2]["text"] == docs[2]


def test_duplicate_spans_within_doc_repeat_removed(spark):
    from statefulstreamprocessor_spark.operators.docclean import (
        remove_duplicate_spans,
    )

    # the same 3-line span twice in ONE document: the first occurrence
    # wins, the second's lines are dropped
    docs = ["a\nb\nc\nmid\na\nb\nc\ntail"]
    out = remove_duplicate_spans(
        _rows(spark, docs), "text", "doc_id", k=3
    ).collect()[0]
    assert out["text"] == "a\nb\nc\nmid\ntail"
    assert (out["n_kept"], out["n_dropped"]) == (5, 3)


def test_duplicate_spans_overlapping_removals_compose(spark):
    from statefulstreamprocessor_spark.operators.docclean import (
        remove_duplicate_spans,
    )

    # doc 1 contains TWO duplicated spans that overlap on line 'y':
    # (x, y) from doc 0 and (y, z) from doc 0 as well (k=2). Covered
    # ordinals union; 'y' is dropped once, not twice.
    docs = [
        "x\ny\nz",
        "p\nx\ny\nz\nq",
    ]
    out = {
        r["id"]: r
        for r in remove_duplicate_spans(
            _rows(spark, docs), "text", "doc_id", k=2
        ).collect()
    }
    assert out[0]["text"] == docs[0]
    assert out[1]["text"] == "p\nq"
    assert (out[1]["n_kept"], out[1]["n_dropped"]) == (2, 3)


def test_duplicate_spans_short_docs_pass_through(spark):
    from statefulstreamprocessor_spark.operators.docclean import (
        remove_duplicate_spans,
    )

    # fewer than k segments -> no spans -> unchanged; empty/None text
    # still comes out (text='') — cleaning never drops documents
    df = spark.createDataFrame(
        [(0, "a\nb"), (1, "a\nb"), (2, ""), (3, None)],
        "doc_id bigint, text string",
    )
    out = {
        r["id"]: r
        for r in remove_duplicate_spans(df, "text", "doc_id", k=3).collect()
    }
    assert len(out) == 4
    assert out[0]["text"] == "a\nb" and out[1]["text"] == "a\nb"
    assert out[2]["text"] == "" and out[3]["text"] == ""


def test_duplicate_spans_window_free_plan(spark):
    """Same discipline as paragraph dedup: duplicate detection is a
    min(struct) aggregate joined back on the fingerprint — no Window
    node anywhere (a viral span must not funnel one window partition)."""
    from statefulstreamprocessor_spark.operators.docclean import (
        remove_duplicate_spans,
    )

    df = _rows(spark, [f"s{i % 5}\nt{i % 5}\nu{i % 5}\nw{i}" for i in range(40)])
    plan = (
        remove_duplicate_spans(df, "text", "doc_id", k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan
