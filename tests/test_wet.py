"""WET source parse/serialize (sources/wet.py)."""

from pyspark.sql import functions as F

from statefulstreamprocessor_spark.sources.wet import (
    read_wet,
    wet_record_col,
)


def _write(path, content: str):
    with open(path, "w", newline="") as f:
        f.write(content)


def _rec(url, date, text):
    body = text.encode()
    return (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
        f"{text}"
        "\r\n\r\n"
    )


def test_parse_canonical_records(spark, tmp_path):
    """Real-format file: CRLF everywhere, interior blank lines and
    unicode survive, final record ends at EOF."""
    t1 = "line one\nline two\n\nафтер blank ☃"
    t2 = ""
    content = _rec("https://a.example/x", "2024-01-02T03:04:05Z", t1) + _rec(
        "https://b.example/y", "2024-06-07T08:09:10Z", t2
    )
    p = tmp_path / "a.wet"
    _write(str(p), content)
    rows = {r["url"]: r for r in read_wet(spark, str(p)).collect()}
    assert set(rows) == {"https://a.example/x", "https://b.example/y"}
    ra = rows["https://a.example/x"]
    assert ra["warc_type"] == "conversion"
    assert ra["warc_date"] == "2024-01-02T03:04:05Z"
    assert ra["text"] == t1
    assert ra["content_length"] == len(t1.encode())
    assert ra["length_ok"] is True
    rb = rows["https://b.example/y"]
    assert rb["text"] == "" and rb["length_ok"] is True


def test_parse_missing_headers_and_audit(spark, tmp_path):
    """Absent headers go NULL; a wrong Content-Length flags length_ok
    false; a record with no blank line yields NULL-ish payload."""
    content = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "\r\n"
        "no uri or date or length\r\n\r\n"
        "WARC/1.0\r\n"
        "WARC-Target-URI: https://c.example/z\r\n"
        "Content-Length: 999\r\n"
        "\r\n"
        "short\r\n\r\n"
        "WARC/1.0\r\n"
        "WARC-Type: warcinfo\r\n"
    )
    p = tmp_path / "b.wet"
    _write(str(p), content)
    out = read_wet(spark, str(p)).collect()
    assert len(out) == 3
    by_type = {}
    for r in out:
        by_type.setdefault((r["warc_type"], r["url"]), r)
    r0 = by_type[("conversion", None)]
    assert r0["warc_date"] is None and r0["content_length"] is None
    assert r0["text"] == "no uri or date or length"
    assert r0["length_ok"] is None  # nothing to audit against
    r1 = by_type[(None, "https://c.example/z")]
    assert r1["content_length"] == 999 and r1["length_ok"] is False
    r2 = by_type[("warcinfo", None)]
    assert r2["text"] is None  # headers-only record: no payload


def test_roundtrip_via_spark_writer(spark, tmp_path):
    """serialize -> .text() writer -> parse recovers the rows even with
    the writer's extra LF between records."""
    rows = [
        ("https://d.example/1", "2024-01-01T00:00:00Z", "alpha\nbeta"),
        ("https://d.example/2", "2024-01-01T00:00:01Z", "x y z"),
        ("https://d.example/3", "2024-01-01T00:00:02Z", ""),
    ]
    df = spark.createDataFrame(rows, "u string, d string, t string")
    rec = F.concat(
        F.lit("WARC/1.0\r\n"),
        wet_record_col(F.col("u"), F.col("d"), F.col("t")),
    )
    out_dir = str(tmp_path / "wet")
    df.select(rec.alias("value")).coalesce(1).write.text(out_dir)
    got = {
        r["url"]: (r["warc_date"], r["text"], r["length_ok"])
        for r in read_wet(spark, out_dir).collect()
    }
    assert got == {u: (d, t, True) for u, d, t in rows}
