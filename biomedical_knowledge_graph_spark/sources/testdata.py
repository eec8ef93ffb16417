"""Loaders for the driver-generated testdata tables (TESTDATA.md) and the
embedded entity dictionary used by the documents-table KG queries.

The dictionary is 1:1 alias→entity (ambiguity/CC paths are exercised by the
fixtures dictionary in fixtures.py and by the lineitem-derived CC query);
it is the single source of truth for both the Spark queries and the DuckDB
oracle SQL (rendered as an inline VALUES CTE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(name)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# alias → (entity_id, entity_type); aliases are single lowercase tokens of
# the documents vocabulary, so word-boundary matching == ' alias ' containment
DOC_ENTITY_DICT: tuple[tuple[str, str, str], ...] = (
    ("join", "ENT:OP:JOIN", "operator"),
    ("scan", "ENT:OP:SCAN", "operator"),
    ("filter", "ENT:OP:FILTER", "operator"),
    ("sort", "ENT:OP:SORT", "operator"),
    ("merge", "ENT:OP:MERGE", "operator"),
    ("agg", "ENT:OP:AGG", "operator"),
    ("window", "ENT:OP:WINDOW", "operator"),
    ("table", "ENT:OBJ:TABLE", "object"),
    ("row", "ENT:OBJ:ROW", "object"),
    ("column", "ENT:OBJ:COLUMN", "object"),
    ("vector", "ENT:OBJ:VECTOR", "object"),
    ("customer", "ENT:ACT:CUSTOMER", "actor"),
    ("spark", "ENT:SYS:SPARK", "system"),
)


def doc_entity_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(DOC_ENTITY_DICT), "alias string, entity_id string, entity_type string"
    )


def doc_dict_cte() -> str:
    """The same dictionary as a DuckDB inline-VALUES CTE body."""
    rows = ", ".join(
        f"('{a}', '{e}', '{t}')" for a, e, t in DOC_ENTITY_DICT
    )
    return f"dict(alias, entity_id, entity_type) AS (VALUES {rows})"


def render_pathway_csv_fixture(nation_rows: list) -> str:
    """Render a NeST-shaped pathway CSV (S10) from the nation/region dims:
    one pathway per region whose gene list is the comma-joined nation names
    of that region. Construction rules (mirrored in the oracle SQL of
    pathway_membership / pathway_modules):

    - NEST ID 'NEST:<r>', name 'PATHWAY_<r>';
    - name_new 'Pathway for region <r>' only for even r (coalesce path);
    - Size_All = 7 for r=0, blank for r=3 (gene-count fallback), else 5;
    - Cisplatin = r*0.5 + 0.1 for even r, the string 'NA' for odd
      (try_cast → null); Etoposide = r*1.25 always;
    - selected = (r % 2 == 0); name_show = r; sum = 3r;
    - Camptothecin/CD437/Gemcitabine/Olaparib columns absent entirely
      (typed-null schema-stability path).
    """
    by_region: dict[int, list[str]] = {}
    for r in sorted(nation_rows, key=lambda r: r["n_nationkey"]):
        by_region.setdefault(r["n_regionkey"], []).append(r["n_name"])
    lines = ["NEST ID,name,name_new,All_Genes,Size_All,Cisplatin,Etoposide,selected,name_show,sum"]
    for r in sorted(by_region):
        genes = ", ".join(by_region[r])  # space after comma → trim path
        name_new = f"Pathway for region {r}" if r % 2 == 0 else ""
        size_all = "7" if r == 0 else ("" if r == 3 else "5")
        cisplatin = f"{r * 0.5 + 0.1:.1f}" if r % 2 == 0 else "NA"
        lines.append(
            f'NEST:{r},PATHWAY_{r},{name_new},"{genes}",{size_all},'
            f"{cisplatin},{r * 1.25:.2f},{str(r % 2 == 0).lower()},{r},{3 * r}"
        )
    return "\n".join(lines) + "\n"


def render_obo_fixture(nation_rows: list) -> str:
    """Render the nation dim as a deterministic OBO ontology so the stanza
    parser's full surface (typed relationships, synonym scope/refs, def
    refs, xrefs) can be driver-oracled against plain SQL over the same
    table. Construction rules (mirrored in the oracle SQL of the
    obo_relationship_edges / obo_synonym_scopes queries):

    - every nation k: term N:<k>, is_a R:<regionkey>;
    - k % 3 == 0: relationship part_of R:<(regionkey+1)%5>;
    - k % 3 == 1: relationship regulates N:<(k+1)%25>;
    - synonym '<name> land', scope EXACT for even k / BROAD for odd,
      with one ref X:<k> iff k % 5 != 0;
    - def text with two refs; xref DB:<k> iff k % 4 == 0.
    """
    out = ["format-version: 1.2", ""]
    for r in sorted(nation_rows, key=lambda r: r["n_nationkey"]):
        k, name, region = r["n_nationkey"], r["n_name"], r["n_regionkey"]
        out += [
            "[Term]",
            f"id: N:{k:02d}",
            f"name: {name}",
            "namespace: biological_process",
            f'def: "Nation {name} term." [REF:{k}, PMID:{7 * k}]',
        ]
        scope = "EXACT" if k % 2 == 0 else "BROAD"
        refs = f"[X:{k}]" if k % 5 != 0 else "[]"
        out.append(f'synonym: "{name} land" {scope} {refs}')
        if k % 4 == 0:
            out.append(f"xref: DB:{k}")
        out.append(f"is_a: R:{region} ! region {region}")
        if k % 3 == 0:
            out.append(f"relationship: part_of R:{(region + 1) % 5} ! next region")
        elif k % 3 == 1:
            out.append(f"relationship: regulates N:{(k + 1) % 25:02d}")
        out.append("")
    return "\n".join(out)
