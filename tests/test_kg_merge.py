"""Incremental snapshot merge: partial per-batch aggregates merged
associatively must reproduce the direct whole-corpus canonicalization."""

from ontonotes_5_parsing_spark.operators import kg

SF = "/root/testdata/sf0.001"


def test_merge_equals_direct_canonicalization(spark):
    merged = {
        r.component: (r.canonical, r.ent_type, r.n_mentions, r.n_surfaces)
        for r in kg.q_kg_merge_increment(spark, SF).collect()
    }
    direct = {
        r.component: (r.canonical, r.ent_type, r.n_mentions, r.n_surfaces)
        for r in kg.q_kg_nodes(spark, SF).collect()
    }
    assert merged == direct and merged


def test_merge_batch_provenance(spark):
    rows = kg.q_kg_merge_increment(spark, SF).collect()
    assert all(r.n_batches in (1, 2) for r in rows)
    # md5-parity split of a non-trivial corpus puts at least one
    # canonical surface in both batches
    assert any(r.n_batches == 2 for r in rows)
