"""URL normalization for webtext corpora — pure column expressions.

The north-rule input is Common-Crawl-style pages keyed by url: before any
url-keyed dedup/join/rollup the urls must be canonicalized (case-folded
host, stripped ``www.``, tracking parameters removed, fragments dropped)
or the same page appears under dozens of spellings and every per-domain
aggregate is wrong.

All extraction is portable regexp (plain character classes, no
lookaround), NOT Spark's ``parse_url``: the same patterns run verbatim in
the DuckDB oracle, so cross-engine parity is by construction. Everything
is JVM-side Catalyst — codegen'd, pushdown-friendly, no Python.
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["url_parts_cols", "normalize_url_col"]

_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(/[^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def url_parts_cols(url_col):
    """Decompose a url into canonical parts.

    ``host``: lowercased authority with a leading ``www.`` stripped.
    ``path``: path with a trailing ``/`` trimmed (root stays ``/``).
    ``query``: query string with ``utm_*`` / ``ref`` tracking parameters
    removed (fragments are never part of any component).
    """
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url_col, _HOST_RE, 1)), r"^www\.", ""
    )
    raw_path = F.regexp_extract(url_col, _PATH_RE, 1)
    path = (
        F.when(raw_path == "", F.lit("/"))
        .when(raw_path == "/", F.lit("/"))
        .otherwise(F.regexp_replace(raw_path, r"/$", ""))
    )
    raw_q = F.regexp_extract(url_col, _QUERY_RE, 1)
    # drop tracking params wherever they sit, then mend the separators.
    # NOTE the replacement string is the one engine-specific spelling:
    # Java regex writes the group reference "$1", RE2 (DuckDB) writes "\1" —
    # the PATTERNS are identical in both engines.
    q1 = F.regexp_replace(raw_q, r"(^|&)(utm_[a-z]+|ref)=[^&]*", "$1")
    q2 = F.regexp_replace(q1, r"&&+", "&")
    query = F.regexp_replace(F.regexp_replace(q2, r"&$", ""), r"^&", "")
    return {"host": host, "path": path, "query": query}


def normalize_url_col(url_col):
    """Canonical url: ``https://host/path[?query]`` from the parts above
    (scheme folded to https — corpus identity, not fetch semantics)."""
    p = url_parts_cols(url_col)
    return F.concat(
        F.lit("https://"),
        p["host"],
        p["path"],
        F.when(p["query"] == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), p["query"])
        ),
    )
