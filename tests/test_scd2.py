"""SCD2 history + temporal enrichment (operators/scd2.py) over the
versioned table's snapshot retention (sources/tables.py:history)."""

import pytest
from pyspark.sql import functions as F

from statefulstreamprocessor_spark.operators.scd2 import (
    scd2_enrich,
    scd2_history,
)
from statefulstreamprocessor_spark.sources.tables import create_table

DDL = "k string, color string, n bigint"


def _versioned(spark, rows):
    """rows: (k, color, n, version)"""
    return spark.createDataFrame(
        rows, "k string, color string, n bigint, _version bigint"
    )


def _hist(spark, rows, cur):
    out = scd2_history(_versioned(spark, rows), ["k"], cur)
    return {
        (r["k"], r["valid_from"]): (
            r["color"], r["n"], r["valid_to"], r["is_current"]
        )
        for r in out.collect()
    }


def test_runs_break_on_change_gap_and_delete(spark):
    rows = [
        # a: same attrs v0-v2 -> one run, current
        ("a", "red", 1, 0), ("a", "red", 1, 1), ("a", "red", 1, 2),
        # b: attr change at v1 -> two runs
        ("b", "red", 1, 0), ("b", "blue", 1, 1), ("b", "blue", 1, 2),
        # c: deleted at v1, re-inserted identical at v2 -> gap splits
        ("c", "red", 9, 0), ("c", "red", 9, 2),
        # d: deleted before current -> single non-current run
        ("d", "red", 1, 0), ("d", "red", 1, 1),
    ]
    got = _hist(spark, rows, cur=2)
    assert got == {
        ("a", 0): ("red", 1, 2, True),
        ("b", 0): ("red", 1, 0, False),
        ("b", 1): ("blue", 1, 2, True),
        ("c", 0): ("red", 9, 0, False),
        ("c", 2): ("red", 9, 2, True),
        ("d", 0): ("red", 1, 1, False),
    }


def test_null_attrs_compare_null_safe(spark):
    rows = [
        ("a", None, 1, 0), ("a", None, 1, 1),   # NULL == NULL: one run
        ("b", None, 1, 0), ("b", "x", 1, 1),    # NULL -> x: break
    ]
    got = _hist(spark, rows, cur=1)
    assert got == {
        ("a", 0): (None, 1, 1, True),
        ("b", 0): (None, 1, 0, False),
        ("b", 1): ("x", 1, 1, True),
    }


def test_duplicate_key_version_fails_loud(spark):
    rows = [("a", "red", 1, 0), ("a", "blue", 1, 0)]
    with pytest.raises(Exception, match="duplicate"):
        scd2_history(_versioned(spark, rows), ["k"], 0).collect()


def test_input_validation(spark):
    df = _versioned(spark, [("a", "red", 1, 0)])
    with pytest.raises(ValueError, match="not in input"):
        scd2_history(df, ["missing"], 0)
    with pytest.raises(ValueError, match="no attribute"):
        scd2_history(df.select("k", "_version"), ["k"], 0)
    with pytest.raises(ValueError, match="rename"):
        scd2_history(df.withColumn("valid_to", F.lit(1)), ["k"], 0)


def test_enrich_picks_version_range(spark):
    rows = [
        ("a", "red", 1, 0), ("a", "blue", 1, 1), ("a", "blue", 1, 2),
        ("b", "red", 7, 1),
    ]
    hist = scd2_history(_versioned(spark, rows), ["k"], 2)
    facts = spark.createDataFrame(
        [("f1", "a", 0), ("f2", "a", 2), ("f3", "b", 0), ("f4", "x", 1)],
        "fid string, k string, at bigint",
    )
    out = scd2_enrich(facts, hist, ["k"], "at")
    got = {r["fid"]: (r["dim_color"], r["dim_n"]) for r in out.collect()}
    assert got == {
        "f1": ("red", 1),
        "f2": ("blue", 1),
        "f3": (None, None),   # b did not exist at v0
        "f4": (None, None),   # unknown key
    }
    inner = scd2_enrich(facts, hist, ["k"], "at", how="inner")
    assert {r["fid"] for r in inner.collect()} == {"f1", "f2"}


def test_enrich_collision_and_args(spark):
    hist = scd2_history(
        _versioned(spark, [("a", "red", 1, 0)]), ["k"], 0
    )
    facts = spark.createDataFrame(
        [("a", 0, "x")], "k string, at bigint, dim_color string"
    )
    with pytest.raises(ValueError, match="collide"):
        scd2_enrich(facts, hist, ["k"], "at")
    with pytest.raises(ValueError, match="left|inner"):
        scd2_enrich(facts.drop("dim_color"), hist, ["k"], "at", how="full")


def test_history_from_table_merges(spark, tmp_path):
    """End-to-end over the versioned table: insert -> update -> delete,
    SCD2 ranges reflect the merge history."""
    t = create_table(
        spark, str(tmp_path / "t"), DDL, retain_snapshots=3
    )
    t.append(_versioned(spark, [
        ("a", "red", 1, 0), ("b", "red", 2, 0),
    ]).drop("_version"))                                   # v0
    t.merge_into(
        _versioned(spark, [("a", "blue", 1, 0)]).drop("_version"), ["k"]
    )                                                      # v1: a updated
    t.merge_into(
        _versioned(spark, [("b", "red", 2, 0)]).drop("_version"),
        ["k"],
        when_matched="delete",
    )                                                      # v2: b deleted
    hist = scd2_history(t.history(), ["k"], 2)
    got = {
        (r["k"], r["valid_from"]): (r["color"], r["valid_to"], r["is_current"])
        for r in hist.collect()
    }
    assert got == {
        ("a", 0): ("red", 0, False),
        ("a", 1): ("blue", 2, True),
        ("b", 0): ("red", 1, False),
    }
