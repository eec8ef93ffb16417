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
