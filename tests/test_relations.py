"""Surface-pattern typed relation extraction."""

from __future__ import annotations

from biomedical_knowledge_graph_spark.operators.relations import (
    pattern_typed_relations,
    relation_pattern,
)

VERBS = {"inhibits": "INHIBITS", "activates": "ACTIVATES"}


def _dim(spark):
    return spark.createDataFrame(
        [("abc1", "E:A"), ("xyz2", "E:X"), ("abc1b", "E:AB")],
        "alias string, entity_id string",
    )


def test_pattern_typed_relations(spark):
    docs = spark.createDataFrame(
        [
            (1, "we saw ABC1 inhibits XYZ2 in assays"),
            (2, "abc1 inhibits xyz2 and abc1 activates xyz2"),
            (3, "abc1 inhibits abc1 is a self-loop"),  # dropped
            (4, "abc1 resembles xyz2"),  # verb not in lexicon
            (5, "prefix abc1b activates xyz2"),  # longest-alias match
            (6, None),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.subj, r.pred, r.obj): (r.n_docs, r.n_mentions)
        for r in pattern_typed_relations(docs, _dim(spark), VERBS).collect()
    }
    assert got == {
        ("E:A", "INHIBITS", "E:X"): (2, 2),  # docs 1 (case-folded) + 2
        ("E:A", "ACTIVATES", "E:X"): (1, 1),  # doc 2 second clause
        ("E:AB", "ACTIVATES", "E:X"): (1, 1),  # doc 5: abc1b, not abc1
    }


def test_leftmost_nonoverlap_contract(spark):
    # "a VERB b VERB c": the first match consumes through b, so (b, c)
    # is NOT emitted — the documented surface-pattern bias
    docs = spark.createDataFrame(
        [(1, "abc1 inhibits xyz2 inhibits abc1b")],
        "doc_id long, text string",
    )
    got = {
        (r.subj, r.pred, r.obj)
        for r in pattern_typed_relations(docs, _dim(spark), VERBS).collect()
    }
    assert got == {("E:A", "INHIBITS", "E:X")}


def test_relation_pattern_escapes_and_orders():
    pat = relation_pattern(["a.b", "a"], ["v"])
    # regex-escaped dot, longest alternative first
    assert r"a\.b|a" in pat
    assert pat.startswith(r"\b(")


def test_trie_engine_matches_regex(spark):
    """VERDICT r6 item 4: the large-lexicon trie route must be
    match-for-match identical to the regex route on a shared lexicon —
    leftmost non-overlap, longest-first alternation, outer \\b anchors,
    multi-token aliases, self-loop drop, all of it."""
    docs = spark.createDataFrame(
        [
            (1, "we saw ABC1 inhibits XYZ2 in assays"),
            (2, "abc1 inhibits xyz2 and abc1 activates xyz2"),
            (3, "abc1 inhibits abc1 is dropped"),
            (4, "abc1 resembles xyz2"),
            (5, "prefix abc1b activates xyz2"),  # longest alias wins
            (6, "abc1 inhibits xyz2 inhibits abc1b"),  # non-overlap bias
            (7, "xabc1 inhibits xyz2"),  # \b blocks group 1
            (8, "abc1 inhibits xyz2x"),  # \b blocks group 3
            (9, "alpha kinase one inhibits xyz2"),  # multi-token alias
            (10, None),
            (11, "abc1 inhibits xyz2"),  # duplicate evidence for n_docs
        ],
        "doc_id long, text string",
    )
    dim = spark.createDataFrame(
        [
            ("abc1", "E:A"),
            ("xyz2", "E:X"),
            ("abc1b", "E:AB"),
            ("alpha kinase one", "E:K"),
        ],
        "alias string, entity_id string",
    )
    key = lambda r: (r.subj, r.pred, r.obj)  # noqa: E731
    rx = {
        key(r): (r.n_docs, r.n_mentions)
        for r in pattern_typed_relations(
            docs, dim, VERBS, engine="regex"
        ).collect()
    }
    tr = {
        key(r): (r.n_docs, r.n_mentions)
        for r in pattern_typed_relations(
            docs, dim, VERBS, engine="trie"
        ).collect()
    }
    assert rx == tr
    # sanity on content, not just parity
    assert rx[("E:K", "INHIBITS", "E:X")] == (1, 1)
    assert ("E:A", "INHIBITS", "E:X") in rx
    # auto stays regex for a dictionary-sized lexicon
    auto = {
        key(r): (r.n_docs, r.n_mentions)
        for r in pattern_typed_relations(docs, dim, VERBS).collect()
    }
    assert auto == rx


def test_mixed_case_dictionary(spark):
    """A mixed-case dictionary entry must still join against the
    lowercase matches the pattern extracts (review r6: 'TP53' silently
    yielded zero relations)."""
    dim = spark.createDataFrame(
        [("TP53", "E:P53"), ("MDM2", "E:MDM2")],
        "alias string, entity_id string",
    )
    docs = spark.createDataFrame(
        [(1, "TP53 inhibits MDM2 today")], "doc_id long, text string"
    )
    got = {
        (r.subj, r.pred, r.obj)
        for r in pattern_typed_relations(
            docs, dim, {"inhibits": "INHIBITS"}
        ).collect()
    }
    assert got == {("E:P53", "INHIBITS", "E:MDM2")}
