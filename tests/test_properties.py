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


@given(
    st.lists(
        st.text(alphabet="ab_ -", min_size=1, max_size=5), min_size=1, max_size=10
    ),
    st.text(alphabet="ab_ -x", max_size=150),
    st.booleans(),
)
@settings(max_examples=300, deadline=None)
def test_regex_trie_scanner_equals_aho_corasick(patterns, text, word_boundary):
    """The C-speed trie-regex scanner must reproduce the AC hit set exactly
    — including overlapping occurrences, nested-prefix patterns, and the
    isalnum/underscore boundary rule on patterns that start or end with
    non-word chars (where \\b would differ from AC's check)."""
    from biomedical_knowledge_graph_spark.operators.mentions import (
        RegexTrieScanner,
        _word_bounded,
    )

    ac = AhoCorasick(patterns)
    want = {
        (s, e, p)
        for s, e, p in ac.find_all(text)
        if not word_boundary or _word_bounded(text, s, e)
    }
    got = set(RegexTrieScanner(patterns, word_boundary=word_boundary).find_all(text))
    assert got == want


# -- shingles / Jaccard bounds ------------------------------------------------


@given(st.text(alphabet="ab ", min_size=0, max_size=60))
@settings(max_examples=100, deadline=None)
def test_shingle_count_bound(text):
    n = 5
    shingles = {text[i : i + n] for i in range(max(len(text) - n + 1, 0))}
    assert len(shingles) <= max(len(text) - n + 1, 0)


# -- bucketed as-of join ------------------------------------------------------


def test_asof_bucketed_random_matches_pandas_oracle(spark):
    """For random keys/timestamps (with duplicates and hot keys), the
    range-bucketed as-of join matches pandas merge_asof per key, for
    several bucket counts including degenerate ones."""
    import random

    import pandas as pd

    from biomedical_knowledge_graph_spark.operators.asof import (
        asof_join_bucketed,
    )

    import datetime as dt

    rng = random.Random(17)
    base = dt.datetime(2024, 1, 1)
    left_rows = [
        (i, rng.choice([1, 1, 1, 2, 3]), base + dt.timedelta(seconds=rng.randint(0, 5000)))
        for i in range(300)
    ]
    right_rows = [
        (rng.choice([1, 1, 2, 4]), base + dt.timedelta(seconds=rng.randint(0, 5000)), float(i))
        for i in range(150)
    ]
    left = spark.createDataFrame(left_rows, "event_id long, k long, ts timestamp")
    right = spark.createDataFrame(right_rows, "k long, ts timestamp, v double")

    lp = pd.DataFrame(left_rows, columns=["event_id", "k", "ts"]).sort_values("ts", kind="mergesort")
    rp = pd.DataFrame(right_rows, columns=["k", "ts", "v"]).sort_values("ts", kind="mergesort")
    want_df = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    want = {
        (r.event_id, None if pd.isna(r.v) else r.v)
        for r in want_df.itertuples()
    }
    for n_buckets, hot_threshold in ((1, 10), (2, 0), (7, 50), (64, 10), (8, 10**9)):
        got = {
            (r.event_id, r.v_right)
            for r in asof_join_bucketed(
                left, right, key="k", ts="ts", right_value_cols=["v"],
                n_buckets=n_buckets, hot_threshold=hot_threshold,
            ).collect()
        }
        assert got == want, f"n_buckets={n_buckets} hot={hot_threshold}"


# -- OBO stanza parser --------------------------------------------------------

_obo_line = st.one_of(
    st.just("id: GO:0000001"),
    st.just("name: some term"),
    st.builds(lambda s: f"namespace: {s}", st.sampled_from(["biological_process", "cellular_component"])),
    st.builds(lambda t, r: f'def: "{t}" [{r}]', st.text(alphabet="abc ", max_size=10), st.text(alphabet="A:,1", max_size=8)),
    st.builds(lambda t, sc: f'synonym: "{t}" {sc} []', st.text(alphabet="xy ", max_size=8), st.sampled_from(["EXACT", "BROAD", "NARROW", "RELATED", ""])),
    st.builds(lambda g: f"is_a: GO:{g:07d} ! parent", st.integers(0, 99)),
    st.builds(lambda rt, g: f"relationship: {rt} GO:{g:07d}", st.sampled_from(["part_of", "regulates", ""]), st.integers(0, 99)),
    st.builds(lambda v: f"xref: DB:{v}", st.integers(0, 9)),
    st.just("is_obsolete: true"),
    st.just("replaced_by: GO:0000009"),
    st.just("malformed line without colon—ish"),
    st.just(""),
    st.just("[Typedef]"),
)


@given(st.lists(_obo_line, max_size=20))
@settings(max_examples=150, deadline=None)
def test_obo_stanza_parser_total(lines):
    """The stanza parser never raises on arbitrary line soup, returns None
    without an id, and emits schema-complete dicts otherwise — with is_a
    always mirrored into relationships as IS_A."""
    from biomedical_knowledge_graph_spark.sources.readers import (
        _OBO_COLUMNS,
        _parse_stanza,
    )

    term = _parse_stanza("\n".join(lines))
    if term is None:
        assert not any(line.startswith("id:") for line in lines) or any(
            line.startswith("[") and lines.index(line) < next(
                (i for i, l in enumerate(lines) if l.startswith("id:")), len(lines)
            )
            for line in lines
        )
        return
    assert set(term) == set(_OBO_COLUMNS)
    is_a_rels = [r for r in term["relationships"] if r["rel_type"] == "IS_A"]
    assert [r["target"] for r in is_a_rels] == term["is_a"]
    assert len(term["synonyms"]) == len(term["synonym_details"])
