"""Byte-identity gate for HTML→text extraction (SURVEY.md §7.4-1)."""

from __future__ import annotations

from biomedical_knowledge_graph_spark import fixtures
from biomedical_knowledge_graph_spark.operators.extraction import (
    extract_pages,
    extract_text,
)


def test_pure_function_basics():
    assert extract_text(None) == ""
    assert extract_text(b"") == ""
    assert extract_text(b"<p>hello   world</p>") == "hello world"
    assert extract_text(b"<p>a</p><p>b</p>") == "a\nb"
    assert (
        extract_text(b"<script>var x = 1 < 2;</script><p>kept</p>") == "kept"
    )
    assert extract_text(b"<style>p{}</style><p>kept</p>") == "kept"
    assert extract_text(b"<!-- no --><p>kept</p>") == "kept"
    assert extract_text(b"a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;") == (
        "a & b <tag> \"q\" 's'"
    )
    # &amp;lt; must become &lt; (no double-unescape)
    assert extract_text(b"&amp;lt;") == "&lt;"
    # malformed / unclosed tags survive
    assert extract_text(b"<div><p>dangling") == "dangling"
    # invalid utf-8 is replaced, not fatal
    assert extract_text(b"\xff\xfe<p>x</p>") != ""


def test_extraction_is_deterministic():
    html = b"<html><body><p>alpha kinase beta</p><br>tail</body></html>"
    assert extract_text(html) == extract_text(html)


def test_byte_identity_on_fixture_corpus(spark):
    """Spark-side extraction must equal the golden text for every url."""
    pages = fixtures.pages_df(spark, n_pages=150, seed=7)
    docs = extract_pages(pages, text_col="extracted")
    mismatches = (
        docs.withColumnRenamed("text", "expected")
        .filter("extracted IS DISTINCT FROM expected")
        .count()
    )
    assert mismatches == 0


def test_repeated_runs_byte_identical(spark):
    pages = fixtures.pages_df(spark, n_pages=60, seed=11)
    a = extract_pages(pages, text_col="t").select("url", "t").collect()
    b = extract_pages(pages, text_col="t").select("url", "t").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
