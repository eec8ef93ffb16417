"""End-to-end P/R gate: Spark pipeline triples vs an independent pure-Python
reference ruleset (BASELINE.md target: P/R ≥ 0.95)."""

from __future__ import annotations

from biomedical_knowledge_graph_spark import fixtures
from biomedical_knowledge_graph_spark.plans.pipeline import build_kg
from biomedical_knowledge_graph_spark.sinks.table_format import SnapshotTable


def test_triples_match_reference_ruleset(spark, tmp_path):
    pages_pdf = fixtures.pages_pdf(n_pages=250, seed=42)
    pages = spark.createDataFrame(pages_pdf, schema=fixtures.PAGES_SCHEMA)
    dim = fixtures.entity_dict_df(spark)

    sink = SnapshotTable(str(tmp_path / "triples"), key_cols=["subj", "pred", "obj"])
    result = build_kg(spark, pages, dim, min_cooccur=3, triples_sink=sink)

    got = {
        (r.subj, r.pred, r.obj) for r in result.triples.collect()
    }
    want = fixtures.reference_triples(pages_pdf, min_count=3)
    assert want, "reference ruleset produced no triples — fixture too small"

    tp = len(got & want)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(want)
    assert precision >= 0.95, f"precision {precision:.3f}; diff={got - want}"
    assert recall >= 0.95, f"recall {recall:.3f}; diff={want - got}"

    # sink got the same triples, exactly once
    sink.assert_unique_keys(spark)
    assert sink.count(spark) == len(got)

    # rerun over the same input: resume contract — nothing new lands
    again = build_kg(spark, pages, dim, min_cooccur=3, triples_sink=sink)
    assert sink.count(spark) == len(got)
    assert again is not None


def test_obsolete_aliases_remap(spark):
    pages = spark.createDataFrame(
        fixtures.pages_pdf(n_pages=120, seed=9), schema=fixtures.PAGES_SCHEMA
    )
    dim = fixtures.entity_dict_df(spark)
    result = build_kg(spark, pages, dim, min_cooccur=2)
    ids = {r.entity_id for r in result.links.select("entity_id").distinct().collect()}
    assert "ENT:0000012" not in ids  # obsolete id never appears
    # shared-alias pair collapsed: ENT:0000010 resolved into ENT:0000009
    assert "ENT:0000010" not in ids


def test_triples_invariant_under_partitioning(spark):
    """The emitted triple set must be a pure function of the data — any
    input partitioning / parallelism yields identical output (the property
    that makes the N vs 4N runs comparable and resume safe)."""
    from pyspark.sql import functions as F

    pages_pdf = fixtures.pages_pdf(n_pages=150, seed=21)
    dim = fixtures.entity_dict_df(spark)
    base = spark.createDataFrame(pages_pdf, schema=fixtures.PAGES_SCHEMA)
    out = []
    for n_parts in (2, 16):
        pages = base.repartition(n_parts, F.col("url"))
        triples = build_kg(spark, pages, dim, min_cooccur=2).triples
        out.append(sorted(tuple(r) for r in triples.collect()))
    assert out[0] == out[1]
    assert out[0], "empty triple set makes this test vacuous"


def test_cooccurrence_fanout_cap(spark):
    from biomedical_knowledge_graph_spark.operators.cooccurrence import (
        cooccurrence_edges,
    )

    links = spark.createDataFrame(
        [("d1", f"E{i:02d}") for i in range(10)] + [("d2", "E00"), ("d2", "E01")],
        "doc_id string, canonical_id string",
    )
    full = cooccurrence_edges(links, min_count=1)
    capped = cooccurrence_edges(links, min_count=1, max_entities_per_doc=3)
    assert full.count() == 45 + 0  # d1 contributes C(10,2); d2's pair dupes E00-E01
    # capped: d1 keeps E00,E01,E02 -> 3 pairs; d2 pair E00-E01 merges with d1's
    got = {(r.subj, r.obj): r.shared_docs for r in capped.collect()}
    assert got == {("E00", "E01"): 2, ("E00", "E02"): 1, ("E01", "E02"): 1}


def test_fused_ac_links_equal_unfused_chain(spark):
    """Round 4: the fused scan+link+canonicalize+dedup (mention_strategy
    'ac' → scan_mentions_linked) must produce EXACTLY the unfused chain's
    links and triples — including obsolete remaps, shared-alias component
    resolution, and multi-entity aliases."""
    pages = spark.createDataFrame(
        fixtures.pages_pdf(n_pages=200, seed=7), schema=fixtures.PAGES_SCHEMA
    )
    dim = fixtures.entity_dict_df(spark)
    fused = build_kg(spark, pages, dim, min_cooccur=2, mention_strategy="ac")
    unfused = build_kg(
        spark, pages, dim, min_cooccur=2, mention_strategy="token_join"
    )
    f_links = {
        (r.doc_id, r.entity_id, r.entity_type) for r in fused.links.collect()
    }
    u_links = {
        (r.doc_id, r.entity_id, r.entity_type) for r in unfused.links.collect()
    }
    assert f_links == u_links and len(f_links) > 0
    f_triples = {tuple(r) for r in fused.triples.collect()}
    u_triples = {tuple(r) for r in unfused.triples.collect()}
    assert f_triples == u_triples and len(f_triples) > 0
    fused.links.unpersist()
    unfused.links.unpersist()


def test_apriori_prune_is_exact(spark):
    """Round 4: the a-priori df prune (entities in < min_count docs cannot
    form a surviving pair) must not change the output — compare against
    prune_rare=False on a corpus WITH rare entities, under both the plain
    and input_distinct df paths."""
    from biomedical_knowledge_graph_spark.operators.cooccurrence import (
        cooccurrence_edges,
    )

    rows = []
    # frequent entities A,B co-occur in 5 docs; C occurs in 2 docs (rare
    # at min_count=3); D once; duplicates included to exercise the
    # non-distinct df path
    for d in range(5):
        rows += [(f"d{d}", "A"), (f"d{d}", "B"), (f"d{d}", "A")]
    rows += [("d0", "C"), ("d1", "C"), ("d2", "D")]
    links = spark.createDataFrame(rows, "doc_id string, canonical_id string")
    want = sorted(
        map(tuple, cooccurrence_edges(links, min_count=3, prune_rare=False).collect())
    )
    got = sorted(
        map(tuple, cooccurrence_edges(links, min_count=3, prune_rare=True).collect())
    )
    assert got == want and len(got) == 1  # only (A, B) survives
    # input_distinct path over pre-deduped links
    got_d = sorted(
        map(
            tuple,
            cooccurrence_edges(
                links.distinct(), min_count=3, prune_rare=True, input_distinct=True
            ).collect(),
        )
    )
    assert got_d == want


def test_prune_rare_auto_mode(spark):
    """Round 5 (VERDICT r4 items 2/7): prune_rare='auto' probes the exact
    df distribution and decides per-input; output is identical to both
    forced settings either way, and the decision (plus the measured
    rare-row fraction) lands in the caller's decision_log."""
    from biomedical_knowledge_graph_spark.operators.cooccurrence import (
        cooccurrence_edges,
    )

    # long-tailed input: 3 of 15 link rows (= 20% > 10% threshold) carry
    # sub-min_count entities -> auto prunes
    rows = []
    for d in range(5):
        rows += [(f"d{d}", "A"), (f"d{d}", "B")]
    rows += [("d0", "C"), ("d1", "C"), ("d2", "D"), ("d0", "E"), ("d3", "F")]
    # persisted: auto mode only probes persisted inputs (r6 contract)
    tailed = spark.createDataFrame(
        rows, "doc_id string, canonical_id string"
    ).persist()
    want = sorted(
        map(
            tuple,
            cooccurrence_edges(tailed, min_count=3, prune_rare=False).collect(),
        )
    )
    log: dict = {}
    got = sorted(
        map(
            tuple,
            cooccurrence_edges(
                tailed, min_count=3, prune_rare="auto", decision_log=log
            ).collect(),
        )
    )
    assert got == want
    assert log["prune_rare"] is True and log["prune_rare_mode"] == "auto"
    assert abs(log["rare_row_frac"] - 5 / 15) < 1e-6  # logged at 6 dp

    # dense input: every entity is frequent -> auto skips the prune
    dense_rows = [
        (f"d{d}", e) for d in range(4) for e in ("A", "B", "C")
    ]
    dense = spark.createDataFrame(
        dense_rows, "doc_id string, canonical_id string"
    ).persist()
    want_dense = sorted(
        map(
            tuple,
            cooccurrence_edges(dense, min_count=3, prune_rare=True).collect(),
        )
    )
    log2: dict = {}
    got_dense = sorted(
        map(
            tuple,
            cooccurrence_edges(
                dense, min_count=3, prune_rare="auto", decision_log=log2
            ).collect(),
        )
    )
    assert got_dense == want_dense and len(got_dense) == 3
    assert log2["prune_rare"] is False and log2["rare_row_frac"] == 0.0

    # auto under the fan-out cap: prune ineligible, logged as such
    log3: dict = {}
    cooccurrence_edges(
        dense,
        min_count=3,
        prune_rare="auto",
        max_entities_per_doc=2,
        decision_log=log3,
    ).collect()
    assert log3["prune_rare"] is False and log3["rare_row_frac"] is None


def test_auto_probes_skip_unpersisted_input(spark):
    """VERDICT r5 item 5: the auto-mode probes are driver ACTIONS over
    ``links``; on an unpersisted frame they silently re-run everything
    upstream. The contract is now code, not docstring: with the default
    probe_ok=None, an unpersisted input skips BOTH probes (prune off,
    encoding off, decision_log notes) — proven here with a poisoned
    frame whose evaluation raises, so ANY probe action at call time
    would blow up the construction itself."""
    import pytest
    from pyspark.sql import functions as F
    from biomedical_knowledge_graph_spark.operators.cooccurrence import (
        cooccurrence_edges,
    )

    base = spark.createDataFrame(
        [("d0", "A"), ("d0", "B"), ("d1", "A")],
        "doc_id string, canonical_id string",
    )
    poisoned = base.select(
        "doc_id",
        F.raise_error(F.lit("upstream scan ran")).cast("string").alias(
            "canonical_id"
        ),
    )
    log: dict = {}
    # plan construction must NOT run any action on the poisoned frame
    out = cooccurrence_edges(
        poisoned,
        min_count=3,
        prune_rare="auto",
        encode_ids=True,
        decision_log=log,
    )
    assert log["prune_rare_mode"] == "auto-skipped-unpersisted"
    assert log["encode_ids_skipped_unpersisted"] is True
    # the frame itself is genuinely poisoned — forcing it raises
    with pytest.raises(Exception, match="upstream scan ran"):
        out.collect()
    # probe_ok=True restores the probes (caller vouches the scan is
    # cheap) — on a healthy unpersisted frame the probe runs and logs
    log2: dict = {}
    cooccurrence_edges(
        base, min_count=3, prune_rare="auto", probe_ok=True,
        decision_log=log2,
    ).collect()
    assert log2["prune_rare_mode"] == "auto"
    # output parity: unpersisted auto (probes skipped) == forced-off
    want = sorted(
        map(tuple, cooccurrence_edges(base, min_count=1,
                                      prune_rare=False).collect())
    )
    got = sorted(
        map(tuple, cooccurrence_edges(base, min_count=1,
                                      prune_rare="auto").collect())
    )
    assert got == want


def test_pipeline_lineage_records_prune_decision(spark, tmp_path):
    """build_kg(prune_rare='auto') surfaces the co-occurrence plan
    decision in the snapshot sink's lineage row (VERDICT r4 item 7)."""
    pages = spark.createDataFrame(
        fixtures.pages_pdf(n_pages=60, seed=7), schema=fixtures.PAGES_SCHEMA
    )
    dim = fixtures.entity_dict_df(spark)
    sink = SnapshotTable(
        str(tmp_path / "triples"), key_cols=["subj", "pred", "obj"]
    )
    build_kg(spark, pages, dim, triples_sink=sink, run_id="r5auto")
    row = sink.lineage()[-1]
    assert row["run_id"] == "r5auto"
    co = row["cooccurrence"]
    assert co["prune_rare_mode"] == "auto"
    assert isinstance(co["prune_rare"], bool)


def test_pair_parallelism_reaches_pair_stage(spark):
    """pair_parallelism must control the partition count of the
    pair-explosion input all the way from the public entry points (the
    knob exists because AQE coalesces that stage by its INPUT bytes and
    starves the output-explosive explode; an explicit repartition(n) is
    exempt from AQE coalescing). Pinned at the operator level by counting
    the partitions the explode actually runs over, and at the
    entry-point level by signature forwarding."""
    import inspect

    from biomedical_knowledge_graph_spark.operators.cooccurrence import (
        cooccurrence_edges,
    )
    from biomedical_knowledge_graph_spark.plans import pipeline

    links = spark.createDataFrame(
        [(f"d{i}", f"E{i % 7:02d}") for i in range(200)],
        "doc_id string, canonical_id string",
    )
    edges = cooccurrence_edges(links, min_count=1, pair_parallelism=13)
    plan = edges._jdf.queryExecution().executedPlan().toString()
    # explicit repartition survives into the physical plan, AQE-exempt
    assert "RoundRobinPartitioning(13), REPARTITION_BY_NUM" in plan
    edges.count()  # and executes

    # the knob is forwarded (not silently dropped) by both entry points
    for fn in (pipeline.build_kg, pipeline.build_kg_increment):
        src = inspect.getsource(fn)
        assert "pair_parallelism=pair_parallelism" in src, fn.__name__
