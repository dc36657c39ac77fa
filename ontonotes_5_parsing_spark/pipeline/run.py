"""End-to-end DAG runner: web_pages → nodes/edges.

In-memory mode (tests, bench) chains the stages directly; checkpointed
mode (`work_dir` set) materializes each stage with a lineage manifest
and resumes completed stages on re-run (BASELINE.json:14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from . import lineage
from .canonicalize import build_nodes_edges
from .linking import link_entities
from .stages import annotations_stage, extract_stage, mentions_stage, parse_stage, triples_stage


def run_pipeline(
    pages: DataFrame,
    work_dir: str | None = None,
    resume: bool = True,
) -> dict[str, DataFrame]:
    """Run the full KG-construction DAG; returns all stage DataFrames."""
    spark = pages.sparkSession

    if work_dir is None:
        extracted = extract_stage(pages)
        # sentences and mentions fan out to multiple consumers (triples,
        # linking, annotations): persist AND materialize eagerly —
        # branches of one lazy action would otherwise race the cold
        # cache and each recompute the Python parse chain
        sentences = parse_stage(extracted).persist()
        sentences.count()
        mentions = mentions_stage(sentences).persist()
        mentions.count()
        triples = triples_stage(sentences, mentions)
        # linked is vocabulary-scale and feeds canonical selection plus
        # both endpoint-resolution joins — persist it
        linked = link_entities(mentions).persist()
        nodes, edges = build_nodes_edges(triples, linked)
        return {
            "extracted": extracted,
            "sentences": sentences,
            "mentions": mentions,
            "triples": triples,
            "annotations": annotations_stage(sentences, mentions),
            "linked": linked,
            "nodes": nodes,
            "edges": edges,
        }

    def stage(name: str, build, partition_by=None) -> DataFrame:
        stage_dir = f"{work_dir}/{name}"
        if resume and lineage.is_complete(stage_dir):
            return lineage.load_stage(spark, stage_dir)
        return lineage.materialize(build(), stage_dir, name, partition_by)

    extracted = stage("extracted", lambda: extract_stage(pages))
    sentences = stage("sentences", lambda: parse_stage(extracted))
    mentions = stage("mentions", lambda: mentions_stage(sentences))
    triples = stage("triples", lambda: triples_stage(sentences, mentions))
    linked = stage("linked", lambda: link_entities(mentions))
    nodes_edges: dict[str, DataFrame] = {}

    def build_nodes() -> DataFrame:
        n, e = build_nodes_edges(triples, linked)
        nodes_edges["edges_df"] = e
        return n

    nodes = stage("nodes", build_nodes, partition_by=["ent_type"])
    edges = stage(
        "edges",
        lambda: nodes_edges.get("edges_df", build_nodes_edges(triples, linked)[1]),
    )
    return {
        "extracted": extracted,
        "sentences": sentences,
        "mentions": mentions,
        "triples": triples,
        "annotations": annotations_stage(sentences, mentions),
        "linked": linked,
        "nodes": nodes,
        "edges": edges,
    }
