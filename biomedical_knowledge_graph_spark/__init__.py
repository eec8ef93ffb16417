"""biomedical_knowledge_graph_spark — a PySpark-native knowledge-graph
construction engine.

Re-expresses, Spark-first, the capabilities of the reference repo
``Sukruthr/biomedical-knowledge-graph`` (a Python→Neo4j/Cypher ETL, surveyed
in SURVEY.md): multi-source ingest → per-record extraction → dictionary +
context entity recognition → alias canonicalization with connected-components
entity resolution → relationship derivation (co-occurrence aggregation,
overlap enrichment) → idempotent, resumable, deduplicated materialization of
typed node/edge (triple) tables → count/consistency validation + metrics.

Architecture (NOT a port):
- all dataflow is DataFrame/SQL (Catalyst optimizes: pushdown, pruning,
  broadcast, AQE skew-join);
- Python touches data only through Arrow-vectorized pandas UDFs /
  mapInPandas (HTML→text extraction, dictionary mention scanning);
- the sink is a snapshot/manifest table format with MERGE-by-key semantics
  (Iceberg-equivalent contract; see ``sinks.table_format`` — the Iceberg
  runtime jar is not available offline, the API is a drop-in swap).
"""

__version__ = "0.1.0"

from biomedical_knowledge_graph_spark.session import get_spark, new_session

__all__ = ["get_spark", "new_session", "__version__"]
