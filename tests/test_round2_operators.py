"""Unit tests for round-2 operators: S10 pathway CSV reader, A6 hierarchy
flags, J11 evidence-flag matrix, LSH-gated embedding near-pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from biomedical_knowledge_graph_spark.operators import similarity as sim
from biomedical_knowledge_graph_spark.operators.hierarchy import (
    cluster_hierarchy_flags,
)
from biomedical_knowledge_graph_spark.plans.metrics import evidence_flag_matrix
from biomedical_knowledge_graph_spark.sources import readers


def test_pathway_csv_reader(spark, tmp_path):
    p = tmp_path / "nest.csv"
    p.write_text(
        "NEST ID,name,name_new,All_Genes,Size_All,Cisplatin,Etoposide,"
        "selected,name_show,sum\n"
        'NEST:1,DNA repair,DNA repair extended,"BRCA1, BRCA2 ,RAD51",5,'
        "0.7,1.2,true,3,9\n"
        'NEST:2,orphan,,"TP53",NA,NA,0.5,false,1,2\n'
        "NEST:3,,,missing-name-dropped,,,,,,\n"
    )
    modules, membership = readers.read_pathway_csv(spark, str(p))
    mods = {r.nest_id: r for r in modules.collect()}
    # row validity: the name-less row is dropped
    assert set(mods) == {"NEST:1", "NEST:2"}
    m1 = mods["NEST:1"]
    assert m1.pathway_name == "DNA repair"
    assert m1.pathway_description == "DNA repair extended"
    assert m1.gene_count == 3
    assert m1.size_all == 5
    assert m1.cisplatin_sensitivity == 0.7
    assert m1.etoposide_sensitivity == 1.2
    assert m1.camptothecin_sensitivity is None  # absent column → typed null
    assert m1.is_selected is True
    assert m1.display_priority == 3 and m1.aggregate_score == 9
    m2 = mods["NEST:2"]
    assert m2.pathway_description == "orphan"  # coalesce falls back to name
    assert m2.size_all == 1  # 'NA' Size_All → gene-count fallback
    assert m2.cisplatin_sensitivity is None  # 'NA' → try_cast null
    mem = {(r.nest_id, r.gene_symbol) for r in membership.collect()}
    # split + trim + drop-empties
    assert mem == {
        ("NEST:1", "BRCA1"),
        ("NEST:1", "BRCA2"),
        ("NEST:1", "RAD51"),
        ("NEST:2", "TP53"),
    }


def test_pathway_sensitivity_long(spark, tmp_path):
    p = tmp_path / "nest.csv"
    p.write_text(
        "NEST ID,name,All_Genes,Cisplatin,Olaparib\n"
        "NEST:1,x,\"G1\",0.5,NA\n"
    )
    modules, _ = readers.read_pathway_csv(spark, str(p))
    long_rows = {
        (r.nest_id, r.drug, r.sensitivity)
        for r in readers.pathway_sensitivity_long(modules).collect()
    }
    assert long_rows == {("NEST:1", "cisplatin", 0.5)}


def test_cluster_hierarchy_flags(spark):
    """Reference shape (omics_nest_integration.py:60-108): counts from three
    directions + regex level parse, -1 for unparseable names."""
    gene_edges = spark.createDataFrame(
        [("Cluster2-1", "GA"), ("Cluster2-1", "GB"), ("Cluster2-2", "GC"),
         ("WeirdName", "GD")],
        "src string, dst string",
    )
    cluster_edges = spark.createDataFrame(
        [("Cluster1-0", "Cluster2-1"), ("Cluster1-0", "Cluster2-2"),
         ("Cluster1-0", "WeirdName")],
        "src string, dst string",
    )
    rows = {r.cluster_name: r for r in
            cluster_hierarchy_flags(gene_edges, cluster_edges).collect()}
    assert set(rows) == {"Cluster1-0", "Cluster2-1", "Cluster2-2", "WeirdName"}
    root = rows["Cluster1-0"]
    assert (root.hierarchy_level, root.cluster_id) == (1, 0)
    assert root.child_cluster_count == 3 and root.parent_cluster_count == 0
    assert root.gene_count == 0 and root.is_root and not root.is_leaf
    leaf = rows["Cluster2-1"]
    assert (leaf.hierarchy_level, leaf.cluster_id) == (2, 1)
    assert leaf.gene_count == 2 and leaf.is_leaf and not leaf.is_root
    weird = rows["WeirdName"]
    assert (weird.hierarchy_level, weird.cluster_id) == (-1, -1)
    assert weird.gene_count == 1 and weird.is_leaf


def test_evidence_flag_matrix(spark):
    entities = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    edges = {
        "a": spark.createDataFrame([(1,), (1,), (2,)], "k long"),
        "b": spark.createDataFrame([(1,)], "k long"),
        "c": spark.createDataFrame([(9,)], "k long"),  # key outside entities
    }
    rows = {r.k: r for r in evidence_flag_matrix(entities, edges, "k").collect()}
    assert rows[1].has_a == 1 and rows[1].has_b == 1 and rows[1].has_c == 0
    assert rows[1].data_types == 2
    assert rows[2].data_types == 1
    assert rows[3].data_types == 0  # entity with no evidence keeps a row


def test_ivf_topk_structure(spark):
    """IVF: every returned neighbor shares the query's cell; ranks are
    contiguous from 1; scores equal the exact cosine."""
    import numpy as np

    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter(F.col("vec_id") < 4)
    cents = [0, 20, 40, 60]
    out = sim.ivf_topk(df, queries, centroid_ids=cents, k=3).collect()
    assert out
    cells = {
        r.vec_id: r.cell
        for r in sim.ivf_assign(
            df,
            df.filter(F.col("vec_id").isin(cents)).select(
                F.col("vec_id").alias("cent_id"),
                F.col("embedding").alias("cvec"),
            ),
        ).collect()
    }
    by_q = {}
    for r in out:
        assert cells[r.query_id] == cells[r.neighbor_id]
        by_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # scores match the exact scorer on the same pairs
    exact = {
        (r.query_id, r.neighbor_id): r.score
        for r in sim.cosine_topk(df, queries, k=79).collect()
    }
    for r in out:
        assert abs(exact[(r.query_id, r.neighbor_id)] - r.score) < 1e-9


def test_lsh_near_pairs_recall(spark):
    """Seeded near-dup vectors: multi-table LSH must recover every pair the
    exact all-pairs join finds at the 0.9 threshold (defaults put per-pair
    miss probability below 1e-5 at cosine 0.95)."""
    import numpy as np

    rng = np.random.RandomState(5)
    base = rng.randn(60, 32)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        pert = v + 0.22 * np.roll(v, 1)  # cosine ~0.97 with the original
        rows.append((1000 + i, [float(x) for x in pert]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r.id_a, r.id_b)
        for r in sim.cosine_near_pairs(df, threshold=0.9).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in sim.lsh_near_pairs(df, dim=32, threshold=0.9).collect()
    }
    assert exact  # the construction seeds real pairs
    assert lsh == exact
    # scores agree with the exact path on the intersection
    exact_scores = {
        (r.id_a, r.id_b): r.score
        for r in sim.cosine_near_pairs(df, threshold=0.9).collect()
    }
    for r in sim.lsh_near_pairs(df, dim=32, threshold=0.9).collect():
        assert abs(exact_scores[(r.id_a, r.id_b)] - r.score) < 1e-9
