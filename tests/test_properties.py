"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just fixtures — determinism of extraction, AC scanner correctness
against a naive oracle, shingle/Jaccard bounds."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from biomedical_knowledge_graph_spark.operators.extraction import extract_text
from biomedical_knowledge_graph_spark.operators.mentions import AhoCorasick

# -- extraction ---------------------------------------------------------------

html_bytes = st.binary(max_size=400)


@given(html_bytes)
@settings(max_examples=200, deadline=None)
def test_extract_text_total_and_deterministic(data):
    """Never raises, always a str, byte-identical across calls, no raw tags
    or leading/trailing whitespace per line."""
    out1 = extract_text(data)
    out2 = extract_text(data)
    assert isinstance(out1, str) and out1 == out2
    if out1:
        for line in out1.split("\n"):
            assert line == line.strip()
            assert line != ""  # empty lines dropped


@given(st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_extract_text_plain_text_roundtrip(text):
    """Text with no markup survives modulo whitespace normalization."""
    out = extract_text(text.encode("utf-8"))
    # every output token must exist in the input
    for tok in out.replace("\n", " ").split(" "):
        if tok and "&" not in text and "<" not in text:
            assert tok in text


# -- Aho-Corasick -------------------------------------------------------------

pattern_alphabet = st.text(alphabet="abc", min_size=1, max_size=4)


@given(
    st.lists(pattern_alphabet, min_size=1, max_size=8),
    st.text(alphabet="abc ", max_size=120),
)
@settings(max_examples=200, deadline=None)
def test_aho_corasick_equals_regex_oracle(patterns, text):
    ac = AhoCorasick(patterns)
    got = set(ac.find_all(text))
    # lookahead: plain finditer skips OVERLAPPING occurrences (e.g. 'cc' in
    # 'ccc' twice) which AC rightly reports — hypothesis caught this
    want = {
        (m.start(), m.start() + len(p), p)
        for p in set(patterns)
        for m in re.finditer(f"(?={re.escape(p)})", text)
    }
    assert got == want


# -- shingles / Jaccard bounds ------------------------------------------------


@given(st.text(alphabet="ab ", min_size=0, max_size=60))
@settings(max_examples=100, deadline=None)
def test_shingle_count_bound(text):
    n = 5
    shingles = {text[i : i + n] for i in range(max(len(text) - n + 1, 0))}
    assert len(shingles) <= max(len(text) - n + 1, 0)
