"""Byte-identity invariant for HTML→text extraction (BASELINE.md per-row
invariant; ref behavior: XmlDoc::getUtf8Content / Xml::set)."""

from __future__ import annotations

import json
import os

from golden_cases import CASES

from open_source_search_engine_spark.extraction import (
    extract_text,
    extract_title,
    highlight_terms,
    with_extracted_text,
)
from open_source_search_engine_spark.sources.webtext import generate_webtext

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "extract_text.json")


def test_golden_cases():
    expected = json.load(open(GOLDEN))
    assert set(expected) == set(CASES)
    for name, html in CASES.items():
        got = extract_text(html)
        assert got == expected[name], f"{name}: {got!r} != {expected[name]!r}"


def test_bytes_input_equals_str_input():
    for html in CASES.values():
        assert extract_text(html.encode("utf-8")) == extract_text(html)


def test_webtext_roundtrip():
    """generator's text column is exactly extract_text(html), per doc."""
    t = generate_webtext(200, seed=42)
    htmls = t.column("html").to_pylist()
    texts = t.column("text").to_pylist()
    for h, x in zip(htmls, texts):
        assert extract_text(h) == x
        # byte identity, not just str equality
        assert extract_text(h).encode("utf-8") == x.encode("utf-8")


def test_webtext_deterministic():
    a = generate_webtext(50, seed=42)
    b = generate_webtext(50, seed=42)
    assert a.equals(b)


def test_extraction_properties():
    """Hypothesis: extract_text is total, deterministic, and
    whitespace-normalized on arbitrary (non-HTML) input — the crawler
    feeds it whatever the web serves."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.one_of(st.text(max_size=400), st.binary(max_size=400)))
    @settings(max_examples=300, deadline=None)
    def check(raw):
        out = extract_text(raw)
        assert out == extract_text(raw)
        if out:
            for line in out.split("\n"):
                assert line == " ".join(line.split()) and line != ""
        # title extraction is total too
        extract_title(raw)

    check()


def test_parse_query_total():
    """Hypothesis: the query parser never raises anything but
    ValueError on arbitrary printable input."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from open_source_search_engine_spark.operators.search import parse_query

    @given(st.text(max_size=120))
    @settings(max_examples=300, deadline=None)
    def check(q):
        try:
            parse_query(q)
        except ValueError:
            pass

    check()


def test_extract_title_pinned():
    assert extract_title("<html><head><title>A  B</title></head></html>") == "A B"
    assert extract_title("<TITLE lang=x>Hi &amp; Lo</TITLE>") == "Hi & Lo"
    assert extract_title("<p>no title</p>") == ""
    assert extract_title(None) == ""
    assert extract_title(b"<title>bytes ok</title>") == "bytes ok"
    # first title wins
    assert extract_title("<title>one</title><title>two</title>") == "one"


def test_extract_title_matches_jvm_regex(spark):
    """The JVM-regex form used by the titles_web query equals the
    pinned python function on the (entity-free-title) fixture."""
    from open_source_search_engine_spark.operators.linkextract import titles

    t = generate_webtext(150, seed=42)
    df = spark.createDataFrame(t.to_pandas())
    got = {r["url"]: r["title"] for r in titles(df).collect()}
    for u, h in zip(t.column("url").to_pylist(), t.column("html").to_pylist()):
        assert got[u] == extract_title(h), u


def test_highlight_terms_pinned():
    assert highlight_terms("a quick Fox", {"fox", "a"}) == "<b>a</b> quick <b>Fox</b>"
    assert highlight_terms("nothing here", set()) == "nothing here"
    assert highlight_terms("x,y;x", {"x"}) == "<b>x</b>,y;<b>x</b>"
    # non-matching substrings are not wrapped (maximal runs only)
    assert highlight_terms("foxes", {"fox"}) == "foxes"


def test_udf_matches_pinned_function(spark):
    """The Arrow UDF output is byte-identical to the pinned function —
    the driver-checked invariant, evaluated through the real Spark path."""
    t = generate_webtext(300, seed=42)
    df = spark.createDataFrame(t.to_pandas())
    out = with_extracted_text(df, "html", "text2").select("url", "text", "text2")
    bad = out.filter(out.text != out.text2).count()
    assert bad == 0
