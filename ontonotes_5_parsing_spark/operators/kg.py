"""The KG pipeline itself surfaced as driver queries.

Pages derive deterministically from the driver's `documents` table
(corpus.web_pages_from_documents), so these run at whatever sf_dir the
driver passes. Triple extraction / linking / canonicalization have no
ANSI-SQL equivalent (iterative + UDF stages) → rows-only checks, except
the mention-type histogram whose oracle is reproduced from the same
deterministic corpus via a DuckDB-readable parquet? No — sentence
parsing itself is non-SQL; all kg_* are rows-only.

Stage outputs are cached per (session, sf_dir) so the driver's separate
query invocations share one pipeline run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}


def _pipeline(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    key = (id(spark), sf_dir)
    if key not in _CACHE:
        from ..corpus import web_pages_from_documents
        from ..pipeline import run_pipeline

        pages = web_pages_from_documents(spark, sf_dir)
        out = run_pipeline(pages)
        for name in ("sentences", "mentions", "triples", "linked", "nodes", "edges"):
            out[name] = out[name].persist()
        _CACHE[key] = out
    return _CACHE[key]


def q_kg_triples(spark, sf_dir):
    t = _pipeline(spark, sf_dir)["triples"]
    return t.select("url", "sent_idx", "subj", "pred", "obj", "subj_type", "obj_type")


def q_kg_mention_type_counts(spark, sf_dir):
    m = _pipeline(spark, sf_dir)["mentions"]
    return m.groupBy("ent_type").agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.countDistinct("surface").alias("n_surfaces"),
    )


def q_kg_nodes(spark, sf_dir):
    return _pipeline(spark, sf_dir)["nodes"]


def q_kg_edges_top(spark, sf_dir):
    out = _pipeline(spark, sf_dir)
    nodes = out["nodes"].select(
        F.col("entity_id"), F.col("canonical")
    )
    src_names = nodes.withColumnRenamed("canonical", "src_name").withColumnRenamed(
        "entity_id", "src_entity_id"
    )
    dst_names = nodes.withColumnRenamed("canonical", "dst_name").withColumnRenamed(
        "entity_id", "dst_entity_id"
    )
    return (
        out["edges"]
        .join(F.broadcast(src_names), "src_entity_id")
        .join(F.broadcast(dst_names), "dst_entity_id")
        .select("src_name", "pred", "dst_name", "n_evidence")
        .orderBy(F.desc("n_evidence"), "src_name", "pred", "dst_name")
        .limit(25)
    )


def q_kg_label_reduce(spark, sf_dir):
    """reduce_entities lifecycle over the corpus annotations: emits the
    (label → canonical) rules table (rows-only; iterative + driver-side
    nearest-label step is non-SQL)."""
    from ..pipeline.reduce_labels import build_rules, label_frequencies
    from ..pipeline.stages import annotations_stage

    out = _pipeline(spark, sf_dir)
    ann = annotations_stage(
        out["sentences"].select("url", "sent_idx", "text", "lang"), out["mentions"]
    )
    rules = build_rules(label_frequencies(ann), n_seeds=6)
    if not rules:
        return spark.createDataFrame([], "label string, canonical string")
    return spark.createDataFrame(
        sorted(rules.items()), ["label", "canonical"]
    )


def q_kg_split_rollup(spark, sf_dir):
    """A7 rollup over routed annotations (rows-only)."""
    from ..pipeline.dataset_io import route_splits
    from ..pipeline.stages import annotations_stage
    from ..pipeline.statistics import split_rollup

    out = _pipeline(spark, sf_dir)
    ann = annotations_stage(
        out["sentences"].select("url", "sent_idx", "text", "lang"), out["mentions"]
    )
    return split_rollup(route_splits(ann))


QUERIES = {
    "kg_triples": (q_kg_triples, None),
    "kg_mention_type_counts": (q_kg_mention_type_counts, None),
    "kg_nodes": (q_kg_nodes, None),
    "kg_edges_top": (q_kg_edges_top, None),
    "kg_label_reduce": (q_kg_label_reduce, None),
    "kg_split_rollup": (q_kg_split_rollup, None),
}
