"""Schema'd file readers re-expressing the reference's ingest surface
(SURVEY.md §2.1 S1-S12) as Spark sources.

Every reader declares an explicit schema (no inferSchema in the data path —
SURVEY.md §1.3: "explicit StructType for every input/output table").
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Side-file distribution (round-4, VERDICT r3 item 8): a driver-rendered
# dim file (OBO / pathway CSV fixture) lives on the driver's local disk —
# on a real multi-host cluster `spark.read.<fmt>("/driver/tmp/...")` fails
# on executors. `distribute_side_file` ships it via SparkContext.addFile
# and returns a `sparkfiles:<name>` marker; readers that accept the marker
# open the file AT TASK TIME via SparkFiles.get (each executor resolves
# its own fetched copy), so the plan never embeds a driver-only path.
# ---------------------------------------------------------------------------

SPARKFILES_SCHEME = "sparkfiles:"


def distribute_side_file(spark: SparkSession, local_path: str) -> str:
    """addFile + marker. The basename must be unique per SparkContext
    (addFile contract); callers append a counter when regenerating."""
    import os as _os

    spark.sparkContext.addFile(local_path)
    return SPARKFILES_SCHEME + _os.path.basename(local_path)


def read_wholetext(spark: SparkSession, path: str) -> DataFrame:
    """One row per file with a `value` column holding the full content.

    Plain paths use `spark.read.text(wholetext=True)` (one task per file);
    `sparkfiles:` markers open the executor-local fetched copy inside an
    Arrow-batched task, which works when executors aren't the driver host.
    """
    if path.startswith(SPARKFILES_SCHEME):
        name = path[len(SPARKFILES_SCHEME):]
        marker = spark.range(1).select(F.lit(name).alias("name"))

        def rd(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pyspark import SparkFiles

            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "value": [
                            open(SparkFiles.get(n), encoding="utf-8").read()
                            for n in pdf["name"]
                        ]
                    }
                )

        return marker.mapInPandas(rd, schema="value string")
    return spark.read.text(path, wholetext=True)


# ---------------------------------------------------------------------------
# S2/S3 — two/three-column TSV lookup dims (goID_2_name.tab family)
# ---------------------------------------------------------------------------


def read_lookup_tsv(
    spark: SparkSession,
    path: str,
    columns: list[str],
    header: bool = True,
    namespace_filter: tuple[str, str] | None = None,
) -> DataFrame:
    """Reference: kg_scripts/go_kg_builder.py:237-304 (2-col TSV loaders,
    header-skipped, namespace-filtered at load). The filter lands in the
    scan via predicate pushdown."""
    schema = T.StructType([T.StructField(c, T.StringType(), True) for c in columns])
    df = spark.read.csv(path, sep="\t", header=header, schema=schema)
    if namespace_filter is not None:
        col, value = namespace_filter
        df = df.filter(F.col(col) == value)
    return df


# ---------------------------------------------------------------------------
# S4 — GAF 2.2: gzipped, '!' comments, 17 positional columns
# ---------------------------------------------------------------------------

GAF_COLUMNS = [
    "db",
    "db_object_id",
    "db_object_symbol",
    "qualifier",
    "go_id",
    "db_reference",
    "evidence_code",
    "with_or_from",
    "aspect",
    "db_object_name",
    "db_object_synonym",
    "db_object_type",
    "taxon",
    "date",
    "assigned_by",
    "annotation_extension",
    "gene_product_form_id",
]


def read_gaf(spark: SparkSession, path: str) -> DataFrame:
    """Reference: kg_scripts/go_kg_builder.py:1128-1186 (manual gzip +
    split); Spark handles gzip natively and `comment='!'` replaces the
    manual comment skip. Optional trailing columns arrive as nulls."""
    schema = T.StructType(
        [T.StructField(c, T.StringType(), True) for c in GAF_COLUMNS]
    )
    return spark.read.csv(path, sep="\t", comment="!", header=False, schema=schema)


def gaf_annotations(gaf: DataFrame, aspect: str, qualifier: str) -> DataFrame:
    """P2 aspect/qualifier predicate + P5 projection
    (go_kg_builder.py:1150-1182)."""
    return gaf.filter(
        (F.col("aspect") == aspect) | (F.col("qualifier") == qualifier)
    ).select(
        "db_object_id",
        "db_object_symbol",
        "qualifier",
        "go_id",
        "evidence_code",
        "aspect",
        F.split(F.coalesce(F.col("db_object_synonym"), F.lit("")), r"\|").alias(
            "synonyms"
        ),
        "taxon",
    )


# ---------------------------------------------------------------------------
# S5/S9 — tagged-union 3-col edge files (collapsed_go.*, NeST)
# ---------------------------------------------------------------------------


def read_tagged_union(
    spark: SparkSession, path: str, header: bool = False
) -> tuple[DataFrame, DataFrame]:
    """One scan, two filtered views: ('default' hierarchy rows, 'gene'
    membership rows). Reference: kg_scripts/go_kg_builder.py:1478-1510;
    Catalyst collapses the two filters onto a single cached scan."""
    schema = T.StructType(
        [
            T.StructField("src", T.StringType(), True),
            T.StructField("dst", T.StringType(), True),
            T.StructField("edge_type", T.StringType(), True),
        ]
    )
    df = spark.read.csv(path, sep="\t", header=header, schema=schema)
    hierarchy = df.filter(F.col("edge_type") == "default").drop("edge_type")
    membership = df.filter(F.col("edge_type") == "gene").drop("edge_type")
    return hierarchy, membership


# ---------------------------------------------------------------------------
# S6/S7 — expression matrix (wide) → long form
# ---------------------------------------------------------------------------


def read_expression_matrix_long(
    spark: SparkSession,
    path: str,
    key_col: str,
    sep: str = "\t",
    skip_rows: list[int] | None = None,
    drop_meta_cols: int = 0,
    drop_key_values: list[str] | None = None,
) -> DataFrame:
    """Wide (entity × condition) CSV → long (entity, condition, value),
    dropping null/zero cells (P4, omics_disease_integration.py:115-125).
    The unpivot is a single `stack` projection — no Python, no shuffle.

    Messy-header parametrization (round-3, VERDICT r2 item 7 — the
    reference's disease matrix needs pandas-style gymnastics,
    omics_disease_integration.py:17-27: header row 0, skiprows=[1]
    disease-name row, two metadata columns dropped, a stray 'GeneSym'
    data row removed):

    - ``skip_rows``: 0-based FILE line numbers to drop (0 = the header
      line itself, matching pandas ``skiprows``). Implemented with
      zipWithIndex over the text lines (stable file order) + ``from_csv``
      so parsing stays JVM-side and distributed — no driver pandas.
    - ``drop_meta_cols``: drop the first N non-key columns (leading
      metadata columns, positional like the reference's ``iloc[:, 2:]``).
    - ``drop_key_values``: content-based row drops (e.g. a 'GeneSym'
      header fragment that survived as data)."""
    if skip_rows:
        lines = (
            spark.read.text(path)
            .rdd.zipWithIndex()
            .map(lambda t: (t[1], t[0]["value"]))
            .toDF(["_idx", "_line"])
        )
        skip = set(skip_rows)
        header_idx = next(i for i in range(len(skip) + 1) if i not in skip)
        header_line = lines.filter(F.col("_idx") == header_idx).first()["_line"]
        import csv as _csv
        import io as _io

        cols = next(_csv.reader(_io.StringIO(header_line), delimiter=sep))
        schema_str = ", ".join(f"`{c}` STRING" for c in cols)
        head = (
            lines.filter(
                (~F.col("_idx").isin(list(skip | {header_idx})))
            )
            .select(
                F.from_csv(
                    "_line", schema_str, {"sep": sep, "quote": '"'}
                ).alias("_c")
            )
            .select("_c.*")
        )
    else:
        head = spark.read.csv(path, sep=sep, header=True)
    conditions = [c for c in head.columns if c != key_col][drop_meta_cols:]
    if drop_key_values:
        head = head.filter(~F.col(key_col).isin(list(drop_key_values)))
    stack_args = ", ".join(f"'{c}', `{c}`" for c in conditions)
    long_df = head.selectExpr(
        f"`{key_col}` as entity",
        f"stack({len(conditions)}, {stack_args}) AS (condition, value_str)",
    )
    # try_cast, not cast: Spark 4 runs ANSI mode by default, so a plain cast
    # of a malformed cell ('NA', blank) would throw CAST_INVALID_INPUT and
    # kill the job; the reference's P4 semantics are drop-null/zero instead
    return long_df.select(
        "entity",
        "condition",
        F.expr("try_cast(value_str AS double)").alias("value"),
    ).filter(F.col("value").isNotNull() & (F.col("value") != 0.0))


# ---------------------------------------------------------------------------
# S10 — NeST pathway CSV: gene-list column + per-drug sensitivity columns
# ---------------------------------------------------------------------------

PATHWAY_DRUG_COLUMNS = (
    "Camptothecin",
    "CD437",
    "Cisplatin",
    "Etoposide",
    "Gemcitabine",
    "Olaparib",
)


def read_pathway_csv(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """NeST pathway table → (modules, membership).

    Reference: kg_scripts/omics_pathway_integration.py:35-88 — wide CSV with
    'NEST ID' / 'name' / comma-separated 'All_Genes', optional 'name_new'
    description, six per-drug sensitivity columns, and optional metadata
    ('selected', 'name_show', 'sum'). Row validity = name AND All_Genes
    present; gene list split + trim + drop-empties; description coalesces
    name_new over name; Size_All falls back to the parsed gene count.

    modules: one row per pathway with typed sensitivity/metadata columns
    (absent CSV columns come back as typed nulls so the schema is stable);
    membership: exploded (nest_id, gene_symbol) rows — the MEMBER_OF_PATHWAY
    edge list. All casts are try_cast (ANSI-safe: malformed cells → null,
    matching the reference's pd.notna gates).
    """
    if path.startswith(SPARKFILES_SCHEME):
        # same Spark CSV parser, fed task-time-read lines instead of a
        # driver-only file path (DataFrameReader.csv accepts an RDD[str])
        lines = read_wholetext(spark, path).rdd.flatMap(
            lambda r: r["value"].splitlines()
        )
        raw = spark.read.csv(lines, header=True)
    else:
        raw = spark.read.csv(path, header=True)
    cols = set(raw.columns)

    def opt(name: str, cast: str):
        if name in cols:
            return F.expr(f"try_cast(`{name}` AS {cast})")
        return F.lit(None).cast(cast)

    genes = F.array_remove(
        F.transform(
            F.split(F.col("All_Genes"), ","), lambda g: F.trim(g)
        ),
        "",
    )
    valid = raw.filter(
        F.col("name").isNotNull() & F.col("All_Genes").isNotNull()
    )
    modules = valid.select(
        F.trim(F.col("`NEST ID`")).alias("nest_id"),
        F.trim(F.col("name")).alias("pathway_name"),
        genes.alias("genes"),
        F.size(genes).alias("gene_count"),
        F.coalesce(
            opt("Size_All", "int"), F.size(genes)
        ).alias("size_all"),
        F.coalesce(
            F.trim(opt("name_new", "string")), F.trim(F.col("name"))
        ).alias("pathway_description"),
        *[
            opt(drug, "double").alias(f"{drug.lower()}_sensitivity")
            for drug in PATHWAY_DRUG_COLUMNS
        ],
        opt("selected", "boolean").alias("is_selected"),
        opt("name_show", "int").alias("display_priority"),
        opt("sum", "int").alias("aggregate_score"),
    )
    membership = modules.select(
        "nest_id", F.explode("genes").alias("gene_symbol")
    )
    return modules.drop("genes"), membership


def pathway_sensitivity_long(modules: DataFrame) -> DataFrame:
    """Wide per-drug sensitivity columns → long (nest_id, drug, sensitivity),
    null rows dropped — same stack-unpivot shape as the expression matrix
    (A7), one projection, no shuffle."""
    drugs = [d.lower() for d in PATHWAY_DRUG_COLUMNS]
    stack_args = ", ".join(f"'{d}', {d}_sensitivity" for d in drugs)
    return modules.selectExpr(
        "nest_id",
        f"stack({len(drugs)}, {stack_args}) AS (drug, sensitivity)",
    ).filter(F.col("sensitivity").isNotNull())


# ---------------------------------------------------------------------------
# S1 — stanza-structured documents (OBO [Term] blocks)
# ---------------------------------------------------------------------------

OBO_TERM_SCHEMA = (
    "term_id string, name string, namespace string, definition string, "
    "def_refs array<string>, comment string, "
    "is_obsolete boolean, replaced_by array<string>, alt_ids array<string>, "
    "synonyms array<string>, "
    "synonym_details array<struct<text:string,scope:string,refs:array<string>>>, "
    "is_a array<string>, "
    "relationships array<struct<rel_type:string,target:string,target_name:string>>, "
    "xrefs array<string>, subsets array<string>, consider array<string>, "
    "created_by string, creation_date string"
)

_OBO_COLUMNS = [
    "term_id",
    "name",
    "namespace",
    "definition",
    "def_refs",
    "comment",
    "is_obsolete",
    "replaced_by",
    "alt_ids",
    "synonyms",
    "synonym_details",
    "is_a",
    "relationships",
    "xrefs",
    "subsets",
    "consider",
    "created_by",
    "creation_date",
]

_SYNONYM_SCOPES = ("EXACT", "BROAD", "NARROW", "RELATED")


def _bracket_refs(s: str) -> list[str]:
    """'... [ref1, ref2]' → ['ref1', 'ref2'] (reference:
    go_kg_builder.py:421-425, 443-449 — rfind-based bracket extraction)."""
    start, end = s.find("["), s.rfind("]")
    if start < 0 or end <= start:
        return []
    return [r.strip() for r in s[start + 1 : end].split(",") if r.strip()]


def _parse_stanza(stanza: str) -> dict | None:
    """One [Term] stanza → dict matching OBO_TERM_SCHEMA.

    Field semantics mirror kg_scripts/go_kg_builder.py:358-511:
    - def:      quoted text + trailing [refs] → definition, def_refs;
    - synonym:  quoted text + scope keyword (EXACT/BROAD/NARROW/RELATED,
                default RELATED) + [refs] → synonym_details; plain texts are
                additionally kept in ``synonyms`` for dictionary builders;
    - is_a / relationship: both land in ``relationships`` as
                (rel_type, target, target_name) — is_a as rel_type='IS_A',
                ``relationship: part_of GO:x ! name`` as rel_type='PART_OF'
                (go_kg_builder.py:472-495); ``is_a`` keeps the plain target
                list for hierarchy-only consumers;
    - xref / subset / consider / created_by / creation_date: verbatim
                (go_kg_builder.py:456-469).
    """
    term: dict = {
        "term_id": None,
        "name": None,
        "namespace": None,
        "definition": None,
        "def_refs": [],
        "comment": None,
        "is_obsolete": False,
        "replaced_by": [],
        "alt_ids": [],
        "synonyms": [],
        "synonym_details": [],
        "is_a": [],
        "relationships": [],
        "xrefs": [],
        "subsets": [],
        "consider": [],
        "created_by": None,
        "creation_date": None,
    }
    for line in stanza.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith("["):
            break  # next stanza header ([Typedef] etc.) — stop here
        key, _, val = line.partition(":")
        val = val.strip()
        if key == "id":
            term["term_id"] = val
        elif key == "name":
            term["name"] = val
        elif key == "namespace":
            term["namespace"] = val
        elif key == "def":
            # quoted definition: def: "text" [refs] — the text itself may
            # contain brackets ('[4Fe-4S] cluster'), so the refs block is
            # whatever follows the LAST quote, never a bracket inside it
            if val.startswith('"'):
                end = val.rfind('"')
                if end > 0:
                    term["definition"] = val[1:end]
                    term["def_refs"] = _bracket_refs(val[end:])
                else:
                    term["definition"] = val.strip('"')
            else:
                term["definition"] = val.strip('"')
        elif key == "comment":
            term["comment"] = val
        elif key == "is_obsolete":
            term["is_obsolete"] = val == "true"
        elif key == "replaced_by":
            # accumulate ALL values (reference parity,
            # go_kg_builder.py's obsolete handling keeps a list); the
            # linking remap uses the first element downstream
            term["replaced_by"].append(val)
        elif key == "alt_id":
            term["alt_ids"].append(val)
        elif key == "xref":
            term["xrefs"].append(val)
        elif key == "subset":
            term["subsets"].append(val)
        elif key == "consider":
            term["consider"].append(val)
        elif key == "created_by":
            term["created_by"] = val
        elif key == "creation_date":
            term["creation_date"] = val
        elif key == "synonym":
            if val.startswith('"'):
                parts = val.split('"')
                if len(parts) >= 3:
                    text = parts[1]
                    remainder = parts[2].strip()
                    # the scope is the FIRST token after the closing quote —
                    # a substring scan would misread scope words embedded in
                    # the refs block (e.g. [GOC:EXACT_REF])
                    first_tok = remainder.split(None, 1)[0] if remainder else ""
                    scope = (
                        first_tok if first_tok in _SYNONYM_SCOPES else "RELATED"
                    )
                    term["synonyms"].append(text)
                    term["synonym_details"].append(
                        {"text": text, "scope": scope, "refs": _bracket_refs(remainder)}
                    )
        elif key == "is_a":
            parts = val.split("!", 1)
            target = parts[0].strip()
            term["is_a"].append(target)
            term["relationships"].append(
                {
                    "rel_type": "IS_A",
                    "target": target,
                    "target_name": parts[1].strip() if len(parts) > 1 else None,
                }
            )
        elif key == "relationship":
            # 'relationship: part_of GO:0007052 ! mitotic spindle organization'
            words = val.split()
            if len(words) >= 2:
                term["relationships"].append(
                    {
                        "rel_type": words[0].upper(),
                        "target": words[1],
                        "target_name": val.split("!", 1)[1].strip()
                        if "!" in val
                        else None,
                    }
                )
    return term if term["term_id"] else None


def read_obo_terms(
    spark: SparkSession, path: str, namespace: str | None = None
) -> DataFrame:
    """OBO [Term] stanzas → typed rows. Reference parser:
    kg_scripts/go_kg_builder.py:358-511 (line state machine, driver-side).

    Spark shape: `spark.read.text(wholetext=True)` per file (ontology files
    are dimension-sized — one task per file is the right granularity; the
    1000× scale axis is pages, not ontologies), stanza split + parse inside
    an Arrow-batched mapInPandas. The namespace early-skip (P1,
    go_kg_builder.py:406-411) is applied inside the parser before row
    materialization. ``sparkfiles:<name>`` paths (distribute_side_file)
    are opened executor-locally at task time."""
    raw = read_wholetext(spark, path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["value"].values:
                for stanza in content.split("[Term]")[1:]:
                    term = _parse_stanza(stanza)
                    if term is None:
                        continue
                    if namespace and term["namespace"] != namespace:
                        continue  # early skip — foreign namespace
                    rows.append(term)
            yield pd.DataFrame(rows, columns=_OBO_COLUMNS)

    return raw.mapInPandas(parse, schema=OBO_TERM_SCHEMA)


# ---------------------------------------------------------------------------
# S11/S12 — geneset documents (JSON / YAML-subset)
# ---------------------------------------------------------------------------

GENESET_SCHEMA = (
    "geneset_id string, name string, format string, source_file string, "
    "gene_symbols array<string>"
)


def read_geneset_json(spark: SparkSession, path: str) -> DataFrame:
    """MSigDB-style JSON: {\"SET_NAME\": {\"geneSymbols\": [...]}, ...}.
    Reference: kg_scripts/talisman_geneset_parser.py:194-264. Multi-geneset
    files → one row per geneset (small-document ingest: wholetext +
    mapInPandas, same pattern as OBO)."""
    raw = spark.read.text(path, wholetext=True).withColumn(
        "source_file", F.input_file_name()
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content, src in zip(pdf["value"].values, pdf["source_file"].values):
                try:
                    data = json.loads(content)
                except json.JSONDecodeError:
                    continue
                for name, body in data.items():
                    symbols = body.get("geneSymbols") or body.get("gene_symbols") or []
                    rows.append(
                        {
                            "geneset_id": name.upper(),
                            "name": name,
                            "format": "json",
                            "source_file": src,
                            "gene_symbols": [s for s in symbols if s],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["geneset_id", "name", "format", "source_file", "gene_symbols"],
            )

    return raw.mapInPandas(parse, schema=GENESET_SCHEMA)


def dedupe_genesets_by_priority(genesets: DataFrame) -> DataFrame:
    """W2: JSON overrides YAML for the same geneset_id
    (talisman_geneset_parser.py:85-137) — window dedup, priority then
    deterministic tie-break."""
    from pyspark.sql import Window

    priority = F.when(F.col("format") == "json", 2).otherwise(1)
    w = Window.partitionBy("geneset_id").orderBy(
        F.desc(priority), F.asc("source_file")
    )
    return (
        genesets.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def read_geneset_yaml(spark: SparkSession, path: str) -> DataFrame:
    """Talisman YAML genesets (kg_scripts/talisman_geneset_parser.py:142-192):
    one geneset per file with gene_symbols / gene_ids variants. pyyaml is
    gated behind an import-try (absent → clear error, not a crash at import
    time of this module)."""
    try:
        import yaml
    except ImportError as exc:  # pragma: no cover
        raise RuntimeError("pyyaml not installed; use read_geneset_json") from exc

    raw = spark.read.text(path, wholetext=True).withColumn(
        "source_file", F.input_file_name()
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content, src in zip(pdf["value"].values, pdf["source_file"].values):
                try:
                    data = yaml.safe_load(content)
                except yaml.YAMLError:
                    continue
                if not isinstance(data, dict):
                    continue
                symbols = (
                    data.get("gene_symbols") or data.get("gene_ids") or []
                )
                name = str(data.get("name") or data.get("id") or src)
                rows.append(
                    {
                        "geneset_id": name.upper().replace(" ", "_"),
                        "name": name,
                        "format": "yaml",
                        "source_file": src,
                        "gene_symbols": [str(s) for s in symbols if s],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["geneset_id", "name", "format", "source_file", "gene_symbols"],
            )

    return raw.mapInPandas(parse, schema=GENESET_SCHEMA)
