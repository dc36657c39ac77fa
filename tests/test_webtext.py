"""Webtext ingest operators: packing invariants, sampling determinism,
host-parse totality."""

import pytest
from pyspark.sql import functions as F

from ontonotes_5_parsing_spark.operators import webtext

SF = "/root/testdata/sf0.001"


def test_host_stats_partition_docs(spark):
    stats = webtext.q_host_stats(spark, SF).collect()
    docs = webtext._docs(spark, SF)
    assert sum(r.n_docs for r in stats) == docs.count()
    # every host is the synthesized <source>.crawl.example
    assert all(r.host.endswith(".crawl.example") for r in stats)
    # hosts partition doc_ids: id ranges are disjoint per doc (trivially
    # true) and each host's range is consistent
    assert all(r.min_doc_id <= r.max_doc_id for r in stats)


def test_weighted_sample_deterministic_and_quality_monotone(spark):
    a = {r.source: (r.n_kept, r.kept_chars, r.sum_p_bp)
         for r in webtext.q_weighted_sample(spark, SF).collect()}
    b = {r.source: (r.n_kept, r.kept_chars, r.sum_p_bp)
         for r in webtext.q_weighted_sample(spark, SF).collect()}
    assert a == b and a
    # docs at/above the cap are always accepted (p = BP)
    docs = webtext._docs(spark, SF)
    n_capped = docs.filter(F.col("n_chars") >= webtext.CAP_CHARS).count()
    if n_capped:
        kept_capped = sum(v[0] for v in a.values())
        assert kept_capped >= 1


def test_pack_shards_budget_and_contiguity(spark):
    docs = webtext._docs(spark, SF).select(
        "source", "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    max_doc = docs.agg(F.max("n_tokens")).collect()[0][0]
    rows = webtext.q_pack_shards(spark, SF).collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    total_docs = 0
    for source, shards in by_source.items():
        shards.sort(key=lambda r: r.shard)
        # shard ids are 0..k contiguous
        assert [r.shard for r in shards] == list(range(len(shards)))
        # exclusive-prefix greedy bound: a shard never exceeds
        # BUDGET + (max single doc - 1) tokens, and every shard but the
        # last is "full" (its exclusive prefix crossed the budget line)
        for r in shards:
            assert r.shard_tokens <= webtext.BUDGET + max_doc - 1
            assert r.first_doc <= r.last_doc
        # doc_id ranges of consecutive shards are ordered and disjoint
        for prev, nxt in zip(shards, shards[1:]):
            assert prev.last_doc < nxt.first_doc
        total_docs += sum(r.n_docs for r in shards)
    assert total_docs == docs.count()
