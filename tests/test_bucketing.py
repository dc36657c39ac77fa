"""Bucketed co-located join: the plan property (no Exchange) and the
row-level semantics (same result as joining the raw parquet)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ontonotes_5_parsing_spark.sources.bucketed import (
    ensure_bucketed_documents,
    q_bucketed_doc_stats_join,
)

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark):
    """Both sides bucketed by doc_id → SortMergeJoin bucket-to-bucket
    with zero Exchange before the join. Broadcast is disabled for the
    assertion so the small test tables take the same plan shape the
    100-TB tables would."""
    docs_t, stats_t = ensure_bucketed_documents(spark, SF_DIR)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(docs_t).join(spark.table(stats_t), "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan


def test_bucketed_join_matches_raw_parquet(spark):
    bucketed = q_bucketed_doc_stats_join(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    stats = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.size(F.array_distinct(F.split("text", " "))).alias("n_distinct_tokens"),
    )
    raw = (
        docs.select("doc_id", "lang", "n_chars")
        .join(stats, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_distinct_tokens").alias("total_distinct_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, raw.collect()))
