"""Canonical entity selection + graph materialization (nodes/edges).

The distributed form of the reference's reduce_entities lifecycle
(/root/reference/reduce_entities.py:64-116 — global frequency agg →
top seeds → canonical per cluster → rewrite): count mentions globally
(salted two-phase, done in linking.surface_vocab), pick one canonical
surface per linked component with a *total deterministic ordering*
(SURVEY.md §7 hard part 2 — never `first()` without order), then map
every triple endpoint to its canonical entity id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_entities(linked: DataFrame) -> DataFrame:
    """linked(surface, ent_type, n_mentions, norm, vertex_id, component)
    → one row per component with its canonical surface and entity_id.

    Canonical = the member with the most mentions; ties broken by the
    reference's rule — min (length, value) (reduce_entities.py:111-113)
    — giving a deterministic `min_by` over a composite struct. ent_type
    is the final tiebreaker so the ordering is TOTAL even when one
    component holds the same surface under two entity types (otherwise
    the pick would be engine/partitioning-dependent on exact ties).
    """
    per_component = linked.groupBy("component").agg(
        F.min_by(
            F.struct("surface", "ent_type"),
            F.struct(
                (-F.col("n_mentions")).alias("neg_freq"),
                F.length("surface").alias("len"),
                F.col("surface"),
                F.col("ent_type"),
            ),
        ).alias("canon"),
        F.sum("n_mentions").alias("n_mentions"),
        F.count(F.lit(1)).alias("n_surfaces"),
    )
    return per_component.select(
        "component",
        F.col("canon.surface").alias("canonical"),
        F.col("canon.ent_type").alias("ent_type"),
        "n_mentions",
        "n_surfaces",
        F.xxhash64(F.col("canon.surface"), F.col("canon.ent_type")).alias("entity_id"),
    )


def surface_to_entity(linked: DataFrame, canon: DataFrame) -> DataFrame:
    """(surface, ent_type) → entity_id mapping. Small relative to the
    corpus (vocabulary-sized), so downstream joins broadcast it."""
    return (
        linked.select("surface", "ent_type", "component")
        .join(canon.select("component", "entity_id"), "component")
        .select("surface", "ent_type", "entity_id")
    )


def build_nodes_edges(
    triples: DataFrame, linked: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Materialize the graph: nodes(entity_id, canonical, ent_type,
    n_mentions, n_surfaces) and edges(src_entity_id, pred,
    dst_entity_id, n_evidence).

    The surface→entity map is broadcast (vocabulary ≪ corpus); the edge
    count is a salted two-phase groupBy because head entities make
    (src, pred, dst) keys skewed for the same reason mention counts are.
    """
    canon = canonical_entities(linked)
    # persisted: the mapping is broadcast twice (src side and dst side);
    # without the persist each broadcast build would re-run the
    # canonical-entities aggregation over `linked`
    mapping = surface_to_entity(linked, canon).persist()

    nodes = canon.select(
        "entity_id", "canonical", "ent_type", "n_mentions", "n_surfaces"
    )

    # both endpoint joins broadcast the SAME subplan (`mapping`, renamed
    # only after the join) so Catalyst's ReuseExchange rule dedupes the
    # two BroadcastExchanges into one build job — renaming before the
    # join (the obvious spelling) puts a distinct Project under each
    # exchange and the mapping is built and shipped twice
    src_m = F.broadcast(mapping).alias("src_m")
    dst_m = F.broadcast(mapping).alias("dst_m")
    resolved = (
        triples.join(
            src_m,
            (triples.subj == F.col("src_m.surface"))
            & (triples.subj_type == F.col("src_m.ent_type")),
            "inner",
        )
        .withColumnRenamed("entity_id", "src_entity_id")
        .drop("surface", "ent_type")
        .join(
            dst_m,
            (F.col("obj") == F.col("dst_m.surface"))
            & (F.col("obj_type") == F.col("dst_m.ent_type")),
            "inner",
        )
        .withColumnRenamed("entity_id", "dst_entity_id")
        .drop("surface", "ent_type")
    )
    salted = resolved.withColumn(
        "salt", F.pmod(F.xxhash64("url", "sent_idx"), F.lit(32))
    )
    edges = (
        salted.groupBy("src_entity_id", "pred", "dst_entity_id", "salt")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("src_entity_id", "pred", "dst_entity_id")
        .agg(F.sum("cnt").alias("n_evidence"))
    )
    return nodes, edges
