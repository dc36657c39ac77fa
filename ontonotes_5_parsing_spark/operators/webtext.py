"""Web-corpus ingest operators a Common-Crawl-scale training pipeline
runs around the KG stages: URL/host analytics, quality-weighted
deterministic sampling, and token-budget shard packing.

These extend the engine's LLM-ingest families (SURVEY.md §2 scope) with
the web-text-specific shapes; the reference has no web layer (it reads
a local .onf tree), so the closest analogs are its per-language dataset
splits (/root/reference/ontonotes5_to_json.py:128-141).

Driver-boundary discipline: every output column is an exact integer or
string (the round-2 lesson — no rounded floats at the hash compare).

* ``web_host_stats`` — parse a registered host out of each document's
  URL and roll up per host. The documents table carries no URL, so one
  is synthesized deterministically from (source, doc_id) — the point is
  that BOTH engines then parse it with their own URL machinery
  (Spark ``parse_url``; DuckDB string surgery), a real cross-engine
  check of the parse. Map-only scan + one low-cardinality agg: at
  100 TB hosts are the natural partition key of Common-Crawl layouts,
  and this is the per-host profile every crawl-curation pipeline
  materializes first.

* ``txt_weighted_sample`` — quality-weighted reproducible sampling
  (the CCNet/RedPajama-style subsample): acceptance probability scales
  with a quality proxy (here: document length capped at 400 chars →
  basis points), decided by md5(doc_id) bucket — a pure row-key
  function, stable across engines/partitionings/reruns, never
  rand()/TABLESAMPLE. Map-only at any scale.

* ``pack_token_shards`` — greedy token-budget packing: within each
  source partition, documents in doc_id order accumulate into shards
  of ≤ BUDGET tokens (shard index = floor of the EXCLUSIVE running
  token sum / BUDGET — a document lands in the shard its prefix sum
  opens). Window-sum per source partition, so packing parallelizes
  across sources at crawl scale instead of forcing one global
  ordering; output is the shard manifest (n_docs, token totals,
  doc_id range) a dataloader consumes.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

CAP_CHARS = 400          # quality-proxy cap: n_chars at/above this → p = 1
BP = 10_000              # sampling granularity (basis points)
BUDGET = 512             # tokens per training shard


def _docs(spark: SparkSession, sf_dir: str):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _with_url(docs):
    # deterministic synthetic URL: https://<source>.crawl.example/<lang>/doc-<id>
    return docs.withColumn(
        "url",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".crawl.example/"),
            F.col("lang"),
            F.lit("/doc-"),
            F.col("doc_id").cast("string"),
        ),
    )


def q_host_stats(spark, sf_dir):
    """Per-host crawl profile: docs, bytes, languages, id range.

    Output: (host, n_docs, sum_chars, n_langs, min_doc_id, max_doc_id).
    """
    docs = _with_url(_docs(spark, sf_dir))
    host = F.parse_url("url", F.lit("HOST")).alias("host")
    return (
        docs.select(host, "doc_id", "n_chars", "lang")
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


SQL_HOST_STATS = """
WITH u AS (
  SELECT 'https://' || source || '.crawl.example/' || lang || '/doc-'
           || CAST(doc_id AS VARCHAR) AS url,
         doc_id, n_chars, lang
  FROM documents
), h AS (
  SELECT string_split(string_split(url, '://')[2], '/')[1] AS host,
         doc_id, n_chars, lang
  FROM u
)
SELECT host,
       count(*)                     AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       count(DISTINCT lang)         AS n_langs,
       min(doc_id)                  AS min_doc_id,
       max(doc_id)                  AS max_doc_id
FROM h GROUP BY host
"""


def q_weighted_sample(spark, sf_dir):
    """Quality-weighted deterministic subsample.

    p_bp = basis points of acceptance = least(n_chars, CAP) * BP / CAP
    (integer-exact since BP/CAP divides evenly); accept when the
    md5(doc_id) bucket in [0, BP) is below p_bp. Per-source rollup of
    what survived. Output: (source, n_kept, kept_chars, sum_p_bp).
    """
    docs = _docs(spark, sf_dir)
    p_bp = (F.least(F.col("n_chars"), F.lit(CAP_CHARS)) * (BP // CAP_CHARS)).alias(
        "p_bp"
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
            "long"
        ),
        F.lit(BP),
    )
    kept = (
        docs.select("source", "doc_id", "n_chars", p_bp)
        .withColumn("bucket", bucket)
        .filter(F.col("bucket") < F.col("p_bp"))
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("kept_chars"),
        F.sum("p_bp").alias("sum_p_bp"),
    )


SQL_WEIGHTED_SAMPLE = f"""
WITH k AS (
  SELECT source, doc_id, n_chars,
         least(n_chars, {CAP_CHARS}) * {BP // CAP_CHARS} AS p_bp
  FROM documents
  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        % {BP} < least(n_chars, {CAP_CHARS}) * {BP // CAP_CHARS}
)
SELECT source,
       count(*)                    AS n_kept,
       CAST(sum(n_chars) AS BIGINT) AS kept_chars,
       CAST(sum(p_bp) AS BIGINT)    AS sum_p_bp
FROM k GROUP BY source
"""


def q_pack_shards(spark, sf_dir):
    """Token-budget shard packing manifest, per source partition.

    Output: (source, shard, n_docs, shard_tokens, first_doc, last_doc).
    """
    docs = _docs(spark, sf_dir).select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sharded = docs.withColumn(
        "shard",
        F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / BUDGET),
    )
    return sharded.groupBy("source", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


SQL_PACK_SHARDS = f"""
WITH t AS (
  SELECT source, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), s AS (
  SELECT source, doc_id, n_tokens,
         CAST(floor(coalesce(sum(n_tokens) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           / {BUDGET}) AS BIGINT) AS shard
  FROM t
)
SELECT source, shard,
       count(*)                       AS n_docs,
       CAST(sum(n_tokens) AS BIGINT)  AS shard_tokens,
       min(doc_id)                    AS first_doc,
       max(doc_id)                    AS last_doc
FROM s GROUP BY source, shard
"""


QUERIES = {
    "web_host_stats": (q_host_stats, SQL_HOST_STATS),
    "txt_weighted_sample": (q_weighted_sample, SQL_WEIGHTED_SAMPLE),
    "pack_token_shards": (q_pack_shards, SQL_PACK_SHARDS),
}
