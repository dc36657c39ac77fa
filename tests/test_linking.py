"""Entity linking + canonicalization + graph materialization."""

import pytest
from pyspark.sql import functions as F

from ontonotes_5_parsing_spark import corpus
from ontonotes_5_parsing_spark.kgref.lexicon import ALIAS_GROUPS, GAZETTEER
from ontonotes_5_parsing_spark.pipeline import run_pipeline
from ontonotes_5_parsing_spark.pipeline.linking import (
    add_minhash_bands,
    candidate_pairs,
    connected_components,
    link_entities,
    score_pairs,
)


@pytest.fixture(scope="module")
def out(spark):
    pages = corpus.web_pages_df(spark, 250)
    result = run_pipeline(pages)
    result["mentions"] = result["mentions"].cache()
    result["linked"] = result["linked"].cache()
    return result


def test_alias_groups_share_component(out):
    linked = {
        r.surface: r.component
        for r in out["linked"].select("surface", "component").collect()
    }
    for group in ALIAS_GROUPS:
        present = [s for s in group if s in linked]
        if len(present) >= 2:
            components = {linked[s] for s in present}
            assert len(components) == 1, (group, components)


def test_different_entities_not_merged(out):
    linked = {
        r.surface: r.component
        for r in out["linked"].select("surface", "component").collect()
    }
    for a, b in [("France", "Germany"), ("Paris", "Berlin"), ("Globex", "Initech")]:
        if a in linked and b in linked:
            assert linked[a] != linked[b], (a, b)


def test_canonical_is_most_frequent_then_shortest(out):
    nodes = out["nodes"].collect()
    canon_by_type = {(r.canonical, r.ent_type) for r in nodes}
    # every canonical surface is a known gazetteer/rule surface
    for canonical, ent_type in canon_by_type:
        if canonical in GAZETTEER:
            assert GAZETTEER[canonical] == ent_type


def test_edges_reference_existing_nodes(out):
    node_ids = {r.entity_id for r in out["nodes"].collect()}
    edges = out["edges"].collect()
    assert len(edges) > 0
    for e in edges:
        assert e.src_entity_id in node_ids
        assert e.dst_entity_id in node_ids
        assert e.n_evidence >= 1


def test_node_mention_mass_conserved(out):
    total_mentions = out["mentions"].count()
    node_sum = out["nodes"].agg(F.sum("n_mentions")).collect()[0][0]
    assert node_sum == total_mentions


def test_connected_components_chain(spark):
    # A-B, B-C, D alone → components {A,B,C} and {D}
    vertices = spark.createDataFrame([(1,), (2,), (3,), (4,)], ["vertex_id"])
    edges = spark.createDataFrame([(2, 1), (3, 2)], ["src", "dst"])
    labels = {
        r.vertex_id: r.component
        for r in connected_components(vertices, edges).collect()
    }
    assert labels[1] == labels[2] == labels[3] == 1
    assert labels[4] == 4


def test_lsh_candidates_recall_known_aliases(spark, out):
    vocab = out["linked"]
    pairs = score_pairs(candidate_pairs(add_minhash_bands(vocab)))
    norms = {
        r.vertex_id: r.norm for r in vocab.select("vertex_id", "norm").collect()
    }
    accepted = {
        frozenset((norms[r.src], norms[r.dst])) for r in pairs.collect()
    }
    # obama aliases must be candidate-joined by at least one LSH band
    if any("barack obama" in fs for fs in accepted):
        assert frozenset(("barack obama", "obama")) in accepted


def test_distributed_label_propagation_matches_union_find(spark):
    """Force the distributed label-propagation fallback (the >2M-edge
    path) by setting the driver-side threshold to 0 and assert it
    reaches the identical component fixpoint as the union-find path on
    graphs with chains, cycles, stars, and isolated vertices."""
    from pyspark.sql import functions as F

    from ontonotes_5_parsing_spark.pipeline.linking import connected_components

    edges = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4),          # chain
            (10, 11), (11, 12), (12, 10),    # cycle
            (20, 21), (20, 22), (20, 23),    # star
            (30, 31),
        ],
        "src long, dst long",
    )
    verts = spark.createDataFrame(
        [(v,) for v in [1, 2, 3, 4, 10, 11, 12, 20, 21, 22, 23, 30, 31, 99]],
        "vertex_id long",
    )
    uf = {
        r.vertex_id: r.component
        for r in connected_components(verts, edges).collect()
    }
    lp = {
        r.vertex_id: r.component
        for r in connected_components(
            verts, edges, driver_side_max_edges=0
        ).collect()
    }
    assert lp == uf
    assert uf[4] == 1 and uf[12] == 10 and uf[23] == 20 and uf[99] == 99


def test_salted_vocab_counts_exact_under_extreme_skew(spark):
    """90%-hot-key mention distribution: the two-phase salted aggregation
    must produce exactly the same counts as a plain groupBy (salting
    must never change results, only the shuffle layout)."""
    from pyspark.sql import functions as F

    from ontonotes_5_parsing_spark.pipeline.linking import surface_vocab

    n = 20_000
    mentions = spark.range(n).select(
        F.concat(F.lit("https://x/"), F.col("id")).alias("url"),
        (F.col("id") % 7).alias("sent_idx"),
        F.when(F.col("id") % 10 < 9, "Hot Entity")
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 50).cast("string")))
        .alias("surface"),
        F.lit("ORG").alias("ent_type"),
        F.lit(0).alias("start"),
        F.lit(10).alias("end"),
    )
    got = {
        (r.surface, r.ent_type): r.n_mentions
        for r in surface_vocab(mentions).collect()
    }
    expected = {
        (r.surface, r.ent_type): r.cnt
        for r in mentions.groupBy("surface", "ent_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == expected
    assert got[("Hot Entity", "ORG")] == 18_000


def test_candidate_hot_bucket_guard(spark, monkeypatch):
    """A blocking key shared by more than MAX_BUCKET surfaces is dropped
    before the self-join (quadratic-fanout guard): surfaces linked ONLY
    through the hot token produce no candidate pair, while pairs that
    also share a rarer key survive."""
    from ontonotes_5_parsing_spark.pipeline import linking

    # 6 surfaces share only the token "corp"; two extra surfaces are a
    # near-duplicate pair sharing rare shingle/token keys of their own
    surfaces = [f"{w} corp" for w in ("alpha", "bravo", "charlie", "delta", "echo", "foxtrot")]
    surfaces += ["zenith systems", "zenith system"]
    mentions = spark.createDataFrame(
        [(f"u{i}", 0, s, "ORG") for i, s in enumerate(surfaces)],
        "url string, sent_idx int, surface string, ent_type string",
    )
    def corp_pairs(max_bucket):
        monkeypatch.setattr(linking, "MAX_BUCKET", max_bucket)
        vocab = linking.surface_vocab(mentions)
        pairs = linking.candidate_pairs(linking.add_minhash_bands(vocab))
        norm_pairs = {(r.norm_a, r.norm_b) for r in pairs.collect()}
        return norm_pairs, {
            p for p in norm_pairs if p[0].endswith("corp") and p[1].endswith("corp")
        }

    all_pairs, clique = corp_pairs(4096)
    # unguarded: the shared "corp" token key yields the full 6-choose-2 clique
    assert len(clique) == 15, clique
    guarded_pairs, guarded = corp_pairs(4)
    # guarded: the 6-member "corp" bucket is dropped; only pairs that
    # also collide on a (≤4-member) minhash band bucket may remain
    assert len(guarded) < 15, "hot bucket not dropped"
    assert ("zenith system", "zenith systems") in guarded_pairs or (
        "zenith systems", "zenith system") in guarded_pairs
