"""Bucketed-table sink/source: shuffle-free co-located joins.

At 100 TB the corpus is joined on its document key over and over
(documents ↔ per-doc stats, dedup verify sides, resume anti-joins).
Bucketing the stored tables on that key (`bucketBy(N, key)` +
`sortBy(key)` parquet tables) makes every such join exchange-free:
both scans report HashPartitioning(key, N), so SortMergeJoin runs
bucket-to-bucket with NO shuffle of either side — the single biggest
repeated-shuffle eliminator Spark offers for stable join keys. The
reference has no analog (single-process, /root/reference/
ontonotes5_to_json.py processes one archive in memory); this is the
Spark-native scale design the north rule's Iceberg tables would carry
(Iceberg bucket partition transform ≙ bucketBy here).

`ensure_bucketed_documents` materializes the bucketed pair once per
(warehouse, sf_dir) into a dedicated database under /tmp — the same
memoize-to-a-deterministic-path pattern as operators/kg.py's oracle
stages. The registry query `rel_bucketed_doc_stats_join` then proves
the semantics against a plain DuckDB join of the SOURCE parquet (the
oracle is bucketing-agnostic: same rows must come out), while
tests/test_bucketing.py pins the plan property that makes it worth
doing: SortMergeJoin present, zero Exchange.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..session import session_cache_key

N_BUCKETS = 8
DB = "kgbucketed"
# pid-keyed: a fresh session's in-memory metastore does not know tables
# an earlier process wrote, but saveAsTable refuses a managed location
# that already exists on disk — and concurrent checkouts must not
# clobber each other's buckets
WAREHOUSE = f"/tmp/kg_bucketed_warehouse_{os.getpid()}"

_READY: set[tuple[int, str]] = set()


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = N_BUCKETS,
    sort_cols: list[str] | None = None,
) -> None:
    """Save `df` as a parquet table bucketed (and bucket-sorted) on
    `bucket_cols` — the co-location contract downstream joins rely on."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    writer.saveAsTable(table)


def _table_base(sf_dir: str) -> str:
    return os.path.basename(sf_dir.rstrip("/")).replace(".", "_").replace("-", "_")


def ensure_bucketed_documents(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Materialize documents + a per-doc token-stats table, both
    bucketed by doc_id, once per (session, sf_dir). Returns the two
    table names."""
    base = _table_base(sf_dir)
    docs_t = f"{DB}.docs_{base}"
    stats_t = f"{DB}.stats_{base}"
    key = (session_cache_key(spark), sf_dir)
    if key in _READY:
        return docs_t, stats_t
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {DB} LOCATION '{WAREHOUSE}'")
    # a second session in the same process shares the pid-keyed
    # warehouse but not the first session's catalog: clear any stale
    # managed locations so saveAsTable can recreate them
    for t in (docs_t, stats_t):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = os.path.join(WAREHOUSE, t.split(".", 1)[1])
        if os.path.exists(loc):
            shutil.rmtree(loc)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    write_bucketed(docs.select("doc_id", "lang", "n_chars", "text"), docs_t, ["doc_id"])
    stats = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.size(F.array_distinct(F.split("text", " "))).alias("n_distinct_tokens"),
    )
    write_bucketed(stats, stats_t, ["doc_id"])
    _READY.add(key)
    return docs_t, stats_t


def q_bucketed_doc_stats_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join of the two bucketed tables: per-language totals
    of per-doc token stats. The join runs bucket-to-bucket (no Exchange
    on either side — asserted in tests/test_bucketing.py); only the
    final small aggregation shuffles."""
    docs_t, stats_t = ensure_bucketed_documents(spark, sf_dir)
    docs = spark.table(docs_t).select("doc_id", "lang", "n_chars")
    stats = spark.table(stats_t)
    return (
        docs.join(stats, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_distinct_tokens").alias("total_distinct_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


SQL_BUCKETED_DOC_STATS_JOIN = """
WITH stats AS (
  SELECT doc_id,
         len(string_split(text, ' '))                AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens
  FROM documents
)
SELECT d.lang,
       count(*)                          AS n_docs,
       CAST(sum(s.n_tokens) AS BIGINT)   AS total_tokens,
       CAST(sum(s.n_distinct_tokens) AS BIGINT) AS total_distinct_tokens,
       CAST(sum(d.n_chars) AS BIGINT)    AS total_chars
FROM documents d JOIN stats s USING (doc_id)
GROUP BY d.lang
"""


QUERIES = {
    "rel_bucketed_doc_stats_join": (
        q_bucketed_doc_stats_join,
        SQL_BUCKETED_DOC_STATS_JOIN,
    ),
}
