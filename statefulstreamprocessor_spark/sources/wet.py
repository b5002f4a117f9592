"""WET (WARC conversion) record source — the CommonCrawl text-archive
format a webtext pipeline actually ingests.

A WET file is a stream of records, each ``WARC/1.0`` + CRLF header
lines + a blank line + the extracted-text payload + a blank-line
trailer. The distributed read splits records on the ``WARC/1.0``
record-start marker via the text source's custom ``lineSep`` — Hadoop's
record-delimiter reader, so files still split by byte offset across
tasks and a 100 TB crawl dump fans out without any driver-side work.
Everything after the split is pure JVM column expressions
(``substring``/``locate``/``regexp_extract``), zero Python in the path.

Fidelity contract: header fields come back verbatim (``warc_date`` as
the raw header STRING — parsing it to a timestamp is the caller's
choice of zone semantics, deliberately not baked in here); the payload
is everything after the first blank line with the record's blank-line
trailer stripped, so interior blank lines and CRLFs inside the text
survive. ``length_ok`` audits each record against its own
``Content-Length`` header (UTF-8 octets) — the delimiter split cannot
use Content-Length to find boundaries (that would serialize the scan),
so a body that itself contains the record-start marker at line start
would mis-split; such corruption is exactly what ``length_ok=false``
surfaces, record-local and auditable, instead of silently shifting
every later record in the file the way a sequential parser would.

``wet_record_col`` is the inverse (serializer) used by the round-trip
gate: build the record text as ONE ``concat`` expression so synthesis
is also JVM-side and deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_wet", "wet_record_col"]

_MARKER = "WARC/1.0\r\n"
_BLANK = "\r\n\r\n"


def wet_record_col(
    url: Column, date: Column, text: Column
) -> Column:
    """One WET conversion record as a column expression (without the
    leading ``WARC/1.0`` marker — the writer emits marker + record, the
    reader splits on the marker). ``date`` is the literal header string
    to emit; ``Content-Length`` is computed from the text's UTF-8
    octets like a real WET writer."""
    return F.concat(
        F.lit("WARC-Type: conversion\r\n"),
        F.lit("WARC-Target-URI: "), url, F.lit("\r\n"),
        F.lit("WARC-Date: "), date, F.lit("\r\n"),
        F.lit("Content-Length: "),
        F.octet_length(text).cast("string"),
        F.lit(_BLANK),
        text,
        F.lit(_BLANK),
    )


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Parse WET files under ``path`` into one row per record:
    ``warc_type``, ``url``, ``warc_date`` (verbatim header strings,
    NULL when the header is absent), ``content_length`` (bigint, NULL
    when absent/malformed), ``text`` (payload, interior newlines
    intact), ``length_ok`` (Content-Length == UTF-8 octets of the
    parsed payload; NULL when there is no Content-Length to audit).

    Scale shape: record split in the Hadoop line reader (splittable by
    offset — no per-file serialization), then codegen'd scalar
    expressions; no shuffle, no Python."""
    raw = (
        spark.read.option("lineSep", _MARKER)
        .text(path)
        .filter(F.length("value") > 0)
    )
    v = F.col("value")
    cut = F.locate(_BLANK, v)
    headers = F.when(cut > 0, F.substring(v, 1, cut - 1)).otherwise(v)
    # payload: after the first blank line; strip ONE record trailer —
    # the canonical CRLF CRLF (plus the LF a line-oriented writer adds
    # between records), or a bare LF from LF-normalized archives. A
    # payload that itself ends with the trailer bytes is ambiguous in
    # ANY delimiter-based WET scan; length_ok flags it record-locally.
    body = F.when(
        cut > 0,
        F.regexp_replace(
            F.substring(v, cut + 4, F.lit(2_147_483_647)),
            "(\r\n\r\n\n?|\n)$",
            "",
        ),
    )

    def _hdr(name: str) -> Column:
        got = F.regexp_extract(headers, rf"(?m)^{name}:[ \t]*(.*?)\r?$", 1)
        return F.when(got != "", got)

    clen = _hdr("Content-Length").cast("bigint")
    text = body
    return raw.select(
        _hdr("WARC-Type").alias("warc_type"),
        _hdr("WARC-Target-URI").alias("url"),
        _hdr("WARC-Date").alias("warc_date"),
        clen.alias("content_length"),
        text.alias("text"),
        F.when(
            clen.isNotNull(), clen == F.octet_length(text)
        ).alias("length_ok"),
    )
