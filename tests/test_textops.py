"""Edge cases for the canonical extractor and text analysis functions."""

import pytest

from statefulstreamprocessor_spark.functions.textops import (
    extract_text,
    lang_id_py,
    winnow_fingerprints,
)


@pytest.mark.parametrize(
    "html, want",
    [
        (b"", ""),
        (None, ""),
        (b"plain text no tags", "plain text no tags"),
        (b"<p>a</p><p>b</p>", "a b"),
        (b"<script>var x = '<p>not text</p>';</script>real", "real"),
        (b"<style>p { color: red }</style>styled", "styled"),
        (b"<SCRIPT>upper</SCRIPT>kept", "kept"),
        (b"a &amp; b &lt;c&gt;", "a & b <c>"),
        (b"  lots\n\n of \t whitespace  ", "lots of whitespace"),
        ("<p>unicode é中文</p>".encode(), "unicode é中文"),
        (b"<div class='x' data-y=\"z\">attrs</div>", "attrs"),
        # unclosed tags are not tags — kept verbatim (the function is the
        # spec; generator oracle and UDF share it byte-for-byte)
        (b"broken <div unclosed", "broken <div unclosed"),
        (b"\xff\xfe invalid utf8 <b>x</b>", "�� invalid utf8 x"),
    ],
)
def test_extract_text_edges(html, want):
    assert extract_text(html) == want


def test_extract_text_nested_script_not_greedy():
    # two script blocks must not swallow the text between them
    h = b"<script>a</script>KEEP<script>b</script>"
    assert extract_text(h) == "KEEP"


def test_lang_id_heuristic():
    assert lang_id_py("the cat and the dog is in that house") == "en"
    assert lang_id_py("der hund ist nicht mit der katze") == "de"
    assert lang_id_py("le chat est dans la maison pour une nuit") == "fr"
    assert lang_id_py("") == "und"
    assert lang_id_py("zzz qqq xxx") == "und"


def test_winnow_fingerprints_properties():
    a = winnow_fingerprints("the quick brown fox jumps over the lazy dog")
    b = winnow_fingerprints("the quick brown fox jumps over the lazy dog")
    assert a == b and len(a) > 0  # deterministic
    # local change perturbs only some fingerprints (winnowing locality)
    c = winnow_fingerprints("the quick brown fox jumps over the lazy cat")
    assert set(a) & set(c), "common prefix should share fingerprints"
    assert a != c
    assert winnow_fingerprints("") == []
    assert winnow_fingerprints("ab") == []
