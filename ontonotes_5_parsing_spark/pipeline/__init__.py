"""pipeline — distributed Spark stages of the KG-construction DAG.

    web_pages → extract (pandas UDF) → parse (mapInPandas)
    → mentions → triples (window functions, JVM-side)
    → linking (MinHash/LSH blocking + label-propagation components)
    → canonicalize (salted two-phase groupBy) → nodes/edges.

Exactly two Python stages touch row data (extract, parse) and both are
Arrow-vectorized; everything downstream is native DataFrame ops
(BASELINE.json:15 "no per-row Python anywhere on the hot path").
"""

from .stages import extract_stage, parse_stage, mentions_stage, triples_stage
from .linking import link_entities
from .canonicalize import canonical_entities, build_nodes_edges
from .run import run_pipeline
from .incremental import ingest_batch, merged_counts, merge_snapshot
