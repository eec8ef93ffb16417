"""File-format readers (SURVEY §2.1 S-family)."""

from __future__ import annotations

import gzip
import json

from biomedical_knowledge_graph_spark.sources import readers


def test_lookup_tsv(spark, tmp_path):
    p = tmp_path / "goID_2_namespace.tab"
    p.write_text(
        "id\tnamespace\nGO:0000001\tbiological_process\nGO:0000002\tcellular_component\n"
    )
    df = readers.read_lookup_tsv(
        spark,
        str(p),
        ["id", "namespace"],
        namespace_filter=("namespace", "biological_process"),
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["id"] == "GO:0000001"


def test_gaf_reader_gzip_and_comments(spark, tmp_path):
    lines = [
        "!gaf-version: 2.2",
        "!comment line",
        "\t".join(
            [
                "UniProtKB", "P12345", "SYM1", "involved_in", "GO:0000001",
                "REF:1", "IEA", "", "P", "name", "alt1|alt2", "protein",
                "taxon:9606", "20240101", "UniProt", "", "",
            ]
        ),
        "\t".join(
            [
                "UniProtKB", "P67890", "SYM2", "located_in", "GO:0000002",
                "REF:2", "IDA", "", "C", "name2", "", "protein",
                "taxon:9606", "20240101", "UniProt", "", "",
            ]
        ),
    ]
    p = tmp_path / "anno.gaf.gz"
    with gzip.open(p, "wt") as f:
        f.write("\n".join(lines) + "\n")
    gaf = readers.read_gaf(spark, str(p))
    assert gaf.count() == 2  # comments skipped, gzip transparent
    ann = readers.gaf_annotations(gaf, aspect="P", qualifier="involved_in")
    rows = ann.collect()
    assert len(rows) == 1
    assert rows[0]["go_id"] == "GO:0000001"
    assert rows[0]["synonyms"] == ["alt1", "alt2"]


def test_tagged_union_single_scan(spark, tmp_path):
    p = tmp_path / "collapsed.tsv"
    p.write_text(
        "GO:1\tGO:2\tdefault\nGO:1\tSYM1\tgene\nGO:2\tSYM2\tgene\n"
    )
    hier, mem = readers.read_tagged_union(spark, str(p))
    assert hier.count() == 1 and mem.count() == 2
    assert {r["dst"] for r in mem.collect()} == {"SYM1", "SYM2"}


def test_expression_matrix_unpivot(spark, tmp_path):
    p = tmp_path / "matrix.tsv"
    p.write_text(
        "gene\tcond_a\tcond_b\tcond_c\n"
        "G1\t1.5\t0\t-2.0\n"
        "G2\t\t3.25\t0\n"
    )
    long_df = readers.read_expression_matrix_long(spark, str(p), key_col="gene")
    rows = {(r.entity, r.condition): r.value for r in long_df.collect()}
    # zeros and nulls dropped (P4)
    assert rows == {("G1", "cond_a"): 1.5, ("G1", "cond_c"): -2.0, ("G2", "cond_b"): 3.25}


def test_expression_matrix_reference_disease_format(spark, tmp_path):
    """The reference's exact header gymnastics
    (omics_disease_integration.py:17-27): header line 0 holds condition
    names, line 1 is a disease-name row (pandas skiprows=[1]), the first
    two non-key columns are metadata (iloc[:, 2:]), and a stray 'GeneSym'
    row survived as data and must be dropped."""
    p = tmp_path / "disease_matrix.tsv"
    p.write_text(
        "GeneSym\t#.1\tGEO Accession\tasthma_lung\tanemia_blood\n"
        "\t\t\tAsthma\tAnemia\n"  # disease-name row -> skiprows=[1]
        "GeneSym\tna\tna\tna\tna\n"  # header fragment as data
        "TP53\tx\tGSE1\t1.5\t0\n"
        "BRCA1\ty\tGSE2\t\t-2.25\n"
    )
    long_df = readers.read_expression_matrix_long(
        spark,
        str(p),
        key_col="GeneSym",
        skip_rows=[1],
        drop_meta_cols=2,
        drop_key_values=["GeneSym"],
    )
    rows = {(r.entity, r.condition): r.value for r in long_df.collect()}
    assert rows == {
        ("TP53", "asthma_lung"): 1.5,
        ("BRCA1", "anemia_blood"): -2.25,
    }


def test_obo_stanza_parser(spark, tmp_path):
    obo = """format-version: 1.2

[Term]
id: GO:0000001
name: mitochondrion inheritance
namespace: biological_process
def: "The distribution of mitochondria." [GOC:mcc]
synonym: "mitochondrial inheritance" EXACT []
alt_id: GO:0000100
is_a: GO:0048308 ! organelle inheritance

[Term]
id: GO:0000002
name: something cellular
namespace: cellular_component
is_obsolete: true
replaced_by: GO:0000003

[Typedef]
id: part_of
"""
    p = tmp_path / "go.obo"
    p.write_text(obo)
    all_terms = {r.term_id: r for r in readers.read_obo_terms(spark, str(p)).collect()}
    assert set(all_terms) == {"GO:0000001", "GO:0000002"}
    t1 = all_terms["GO:0000001"]
    assert t1.name == "mitochondrion inheritance"
    assert t1.definition == "The distribution of mitochondria."
    assert t1.synonyms == ["mitochondrial inheritance"]
    assert t1.alt_ids == ["GO:0000100"]
    assert t1.is_a == ["GO:0048308"]
    t2 = all_terms["GO:0000002"]
    assert t2.is_obsolete and t2.replaced_by == ["GO:0000003"]
    # namespace early-skip (P1)
    bp_only = readers.read_obo_terms(
        spark, str(p), namespace="biological_process"
    ).collect()
    assert [r.term_id for r in bp_only] == ["GO:0000001"]


def test_obo_typed_relationships_and_metadata(spark, tmp_path):
    """S1 full parity: typed relationship edges, xref/subset/consider,
    synonym scope+refs, def refs, created_by/creation_date
    (reference: kg_scripts/go_kg_builder.py:412-495)."""
    obo = """format-version: 1.2

[Term]
id: GO:0000022
name: mitotic spindle elongation
namespace: biological_process
def: "The cell cycle process." [GOC:mtg_cell_cycle, PMID:19686080]
comment: Note that this term should not be confused.
synonym: "spindle elongation during mitosis" EXACT [GOC:mah, PMID:1]
synonym: "mitotic elongation" RELATED []
synonym: "broad spindle thing" BROAD [GOC:x]
xref: Reactome:R-HSA-12345
xref: Wikipedia:Spindle
subset: goslim_yeast
consider: GO:0000023
created_by: jl
creation_date: 2010-01-26T11:02:45Z
is_a: GO:0051231 ! spindle elongation
relationship: part_of GO:0000070 ! mitotic sister chromatid segregation
relationship: regulates GO:0007052
"""
    p = tmp_path / "typed.obo"
    p.write_text(obo)
    t = readers.read_obo_terms(spark, str(p)).collect()[0]
    assert t.definition == "The cell cycle process."
    assert t.def_refs == ["GOC:mtg_cell_cycle", "PMID:19686080"]
    assert t.comment == "Note that this term should not be confused."
    assert t.xrefs == ["Reactome:R-HSA-12345", "Wikipedia:Spindle"]
    assert t.subsets == ["goslim_yeast"]
    assert t.consider == ["GO:0000023"]
    assert t.created_by == "jl"
    assert t.creation_date == "2010-01-26T11:02:45Z"
    # synonyms: plain texts preserved for dictionary builders
    assert t.synonyms == [
        "spindle elongation during mitosis",
        "mitotic elongation",
        "broad spindle thing",
    ]
    details = [(d.text, d.scope, list(d.refs)) for d in t.synonym_details]
    assert details == [
        ("spindle elongation during mitosis", "EXACT", ["GOC:mah", "PMID:1"]),
        ("mitotic elongation", "RELATED", []),
        ("broad spindle thing", "BROAD", ["GOC:x"]),
    ]
    # relationships: is_a lands as IS_A alongside typed relationship: lines
    rels = [(r.rel_type, r.target, r.target_name) for r in t.relationships]
    assert rels == [
        ("IS_A", "GO:0051231", "spindle elongation"),
        ("PART_OF", "GO:0000070", "mitotic sister chromatid segregation"),
        ("REGULATES", "GO:0007052", None),
    ]
    assert t.is_a == ["GO:0051231"]


def test_obo_bracketed_definition_and_scope_in_refs():
    """Review regressions: '[' inside the quoted definition must not corrupt
    it or drop def_refs; a scope keyword embedded in a synonym ref must not
    override the real scope."""
    from biomedical_knowledge_graph_spark.sources.readers import _parse_stanza

    term = _parse_stanza(
        "\n".join(
            [
                "id: GO:0000001",
                'def: "Binding to a [4Fe-4S] cluster." [GOC:mah, PMID:1]',
                'synonym: "S phase thing" RELATED [GOC:EXACT_REF]',
                'synonym: "bare" [X:1]',
            ]
        )
    )
    assert term["definition"] == "Binding to a [4Fe-4S] cluster."
    assert term["def_refs"] == ["GOC:mah", "PMID:1"]
    details = [(d["text"], d["scope"], d["refs"]) for d in term["synonym_details"]]
    assert details == [
        ("S phase thing", "RELATED", ["GOC:EXACT_REF"]),
        ("bare", "RELATED", ["X:1"]),  # missing scope defaults to RELATED
    ]


def test_geneset_json_and_priority_dedup(spark, tmp_path):
    (tmp_path / "a.json").write_text(
        json.dumps(
            {
                "HALLMARK_ONE": {"geneSymbols": ["A", "B", ""]},
                "CUSTOM_TWO": {"geneSymbols": ["C"]},
            }
        )
    )
    df = readers.read_geneset_json(spark, str(tmp_path / "a.json"))
    rows = {r.geneset_id: r for r in df.collect()}
    assert rows["HALLMARK_ONE"].gene_symbols == ["A", "B"]  # empty dropped
    assert rows["CUSTOM_TWO"].format == "json"

    # W2 priority dedup: json beats yaml for the same geneset_id
    both = spark.createDataFrame(
        [
            ("GS1", "gs1", "yaml", "f1.yaml", ["A"]),
            ("GS1", "gs1", "json", "f2.json", ["A", "B"]),
            ("GS2", "gs2", "yaml", "f3.yaml", ["C"]),
        ],
        readers.GENESET_SCHEMA,
    )
    kept = {
        r.geneset_id: r.format
        for r in readers.dedupe_genesets_by_priority(both).collect()
    }
    assert kept == {"GS1": "json", "GS2": "yaml"}


def test_geneset_yaml(spark, tmp_path):
    (tmp_path / "gs.yaml").write_text(
        "name: my geneset\ngene_symbols:\n  - ABC\n  - DEF\n"
    )
    rows = {
        r.geneset_id: r
        for r in readers.read_geneset_yaml(spark, str(tmp_path / "gs.yaml")).collect()
    }
    assert rows["MY_GENESET"].gene_symbols == ["ABC", "DEF"]
    assert rows["MY_GENESET"].format == "yaml"
