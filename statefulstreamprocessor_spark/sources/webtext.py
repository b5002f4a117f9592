"""Deterministic synthetic Common-Crawl-style webtext table.

The engine's primary input shape (production spec `input_hint`):
``(url string, warc_ts timestamp, html binary, text string, lang string)``
plus a ``side`` column ('r'/'s') marking the two crawl passes that feed the
two-sided pairwise join (the analogue of the reference's two quantities
``actSpeed_C11`` / ``vaTorque_C11``, reference ts_join_with_kafka_eos.py:30).

Generation is fully deterministic (numpy PCG64 with a fixed seed):
* domains drawn from a Zipf-skewed pool — a few hot domains for skew tests;
* per-url monotone warc_ts with sub-second jitter (in-order per series,
  unordered across series — the reference's ordering model, README:220-230);
* html embeds url + sequence + filler so extraction output is checkable;
* ``text`` is the byte-exact output of the canonical extractor — the
  oracle column for the byte-identity test.

At 100 TB the same schema arrives as an Iceberg table partitioned by
``days(warc_ts), bucket(N, url)``; this module is the sandbox stand-in.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.textops import extract_text

WEBTEXT_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, "
    "lang string, side string, fetch_seq bigint"
)

_LANGS = ["en", "de", "fr", "es"]

_FILLER = {
    "en": "the quick crawl indexed the page and the text was stored with the data",
    "de": "der schnelle crawler hat die seite indexiert und der text ist mit den daten",
    "fr": "le robot rapide a indexé la page et le texte est dans les données pour une",
    "es": "el rastreador rápido indexó la página y el texto es de los datos que en un",
}


def _make_html(url: str, seq: int, lang: str, jitter: int) -> bytes:
    filler = _FILLER[lang]
    body = (
        f"<html><head><title>{url} #{seq}</title>"
        f"<script>var x={jitter};</script></head>"
        f"<body><h1>Fetch {seq} of {url}</h1>"
        f"<p>{filler} {seq} &amp; {jitter}</p>"
        f"<div>rev {jitter % 97}</div></body></html>"
    )
    return body.encode("utf-8")


def generate_webtext(
    n_rows: int,
    n_domains: int = 50,
    seed: int = 42,
    zipf_a: float = 1.5,
    start_epoch: int = 1_700_000_000,
) -> pd.DataFrame:
    """Deterministic webtext table as a pandas DataFrame (see module doc)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    dom_idx = np.minimum(rng.zipf(zipf_a, size=n_rows) - 1, n_domains - 1)
    path_idx = rng.integers(0, 20, size=n_rows)
    side = np.where(rng.random(n_rows) < 0.5, "r", "s")
    url_code = dom_idx * 20 + path_idx
    urls = np.array(
        [f"https://d{d:03d}.example.org/p{p:02d}" for d, p in zip(dom_idx, path_idx)]
    )
    # per-url monotone timestamps + fetch sequence, vectorized: cumulative
    # increments within each url in generation order
    increments = rng.random(n_rows) * 30.0 + 0.5
    s_idx = pd.Series(url_code)
    ts = (
        float(start_epoch)
        + pd.Series(increments).groupby(s_idx, sort=False).cumsum().to_numpy()
    )
    seqs = s_idx.groupby(s_idx, sort=False).cumcount().to_numpy().astype(np.int64)
    lang = np.array([_LANGS[int(d) % len(_LANGS)] for d in dom_idx])
    jitter = rng.integers(0, 1_000_000, size=n_rows)
    html = [
        _make_html(u, int(q), lg, int(j))
        for u, q, lg, j in zip(urls, seqs, lang, jitter)
    ]
    text = [extract_text(h) for h in html]
    return pd.DataFrame(
        {
            "url": urls,
            # µs precision: what parquet TIMESTAMP(MICROS)/Spark expect
            "warc_ts": pd.to_datetime((ts * 1e6).astype(np.int64), unit="us").astype(
                "datetime64[us]"
            ),
            "html": html,
            "text": text,
            "lang": lang,
            "side": side,
            "fetch_seq": seqs,
        }
    )


def write_webtext_parquet(path: str, n_rows: int, **kw) -> str:
    pdf = generate_webtext(n_rows, **kw)
    pdf.to_parquet(path, index=False)
    return path
