"""Property tests for the round-6 operators: each is pinned against an
independent Python reference over hypothesis-generated corpora (the same
strategy the mention scanner uses — the Spark implementation and the
reference share no code, so agreement on arbitrary inputs is strong
evidence of the contract, not of a shared bug)."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings, strategies as st

from biomedical_knowledge_graph_spark.operators.boilerplate import (
    remove_repeated_windows,
)
from biomedical_knowledge_graph_spark.operators.relations import (
    pattern_typed_relations,
)

# tiny vocab so repeats actually happen in small corpora
_WORD = st.sampled_from(["aa", "bb", "cc", "dd", "x1", "y2"])
_DOC = st.lists(_WORD, min_size=0, max_size=12).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=6)


def _py_remove_repeated_windows(texts, w, min_count):
    toks = {i: [t for t in txt.split(" ") if t] for i, txt in enumerate(texts)}
    wins = {}  # window tuple -> count
    for ts in toks.values():
        for i in range(max(len(ts) - w + 1, 0)):
            key = tuple(ts[i : i + w])
            wins[key] = wins.get(key, 0) + 1
    out = {}
    for doc, ts in toks.items():
        covered = set()
        for i in range(max(len(ts) - w + 1, 0)):
            if wins[tuple(ts[i : i + w])] >= min_count:
                covered.update(range(i, i + w))
        kept = [t for i, t in enumerate(ts) if i not in covered]
        out[doc] = (" ".join(kept), len(ts), len(ts) - len(kept))
    return out


@given(corpus=_CORPUS, w=st.integers(min_value=2, max_value=4))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_remove_repeated_windows_matches_python(spark, corpus, w):
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    expected = _py_remove_repeated_windows(corpus, w, 2)
    got = {
        r.doc_id: (r.text_clean, r.n_tokens, r.n_removed_tokens)
        for r in remove_repeated_windows(df, w=w, min_count=2).collect()
    }
    assert got == expected


_ALIASES = [("aa", "E:AA"), ("bb", "E:BB"), ("x1", "E:X1")]
_VERBS = {"cc": "REL_CC", "dd": "REL_DD"}
_PAT = re.compile(r"\b(aa|bb|x1) (cc|dd) (aa|bb|x1)\b")


def _py_typed_relations(texts):
    out = {}
    ent = dict(_ALIASES)
    for doc, txt in texts.items():
        for m in _PAT.finditer(txt.lower()):
            s, o = ent[m.group(1)], ent[m.group(3)]
            if s == o:
                continue
            key = (s, _VERBS[m.group(2)], o)
            docs, n = out.get(key, (set(), 0))
            docs.add(doc)
            out[key] = (docs, n + 1)
    return {k: (len(d), n) for k, (d, n) in out.items()}


@given(corpus=_CORPUS)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_typed_relations_match_python_finditer(spark, corpus):
    texts = dict(enumerate(corpus))
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    dim = spark.createDataFrame(_ALIASES, "alias string, entity_id string")
    expected = _py_typed_relations(texts)
    got = {
        (r.subj, r.pred, r.obj): (r.n_docs, r.n_mentions)
        for r in pattern_typed_relations(df, dim, _VERBS).collect()
    }
    assert got == expected
