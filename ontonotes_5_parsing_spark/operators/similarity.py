"""Similarity search over the `embeddings` table (vec_id,
embedding: array<float>, label).

- brute-force cosine top-k: the correctness baseline, with a DuckDB
  oracle. Output is int-only (query, neighbor, rank) — ranking is
  computed from the unrounded cosine in both engines (any monotone
  variant agrees), so no float ever reaches the hash compare.
- LSH-bucketed variant: random-hyperplane signatures → candidates only
  inside matching buckets — the scale path (rows-only check).
- per-label norm stats: float outputs, same formula both engines.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

N_QUERIES = 10
TOP_K = 5


def _emb(spark: SparkSession, sf_dir: str):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


# --- brute-force cosine top-k ---------------------------------------------
def q_cosine_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cand = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    cos = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    scored = (
        F.broadcast(queries)
        .join(cand, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank")
    )


SQL_COSINE_TOPK = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(qv, e.embedding) AS cos
  FROM q JOIN embeddings e ON e.vec_id <> query_id
), ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= {TOP_K}
"""


# --- LSH-bucketed ANN (scale path; rows-only) ------------------------------
N_PLANES = 6
_rng = np.random.RandomState(42)
_PLANES = _rng.standard_normal((N_PLANES, 64)).round(4).tolist()


def q_ann_lsh_buckets(spark, sf_dir):
    """Random-hyperplane signature buckets: vectors sharing all N_PLANES
    signs land in one bucket; candidate search is per-bucket. At scale,
    buckets shard the O(n²) problem into shuffle-local pieces."""
    emb = _emb(spark, sf_dir)
    sig_bits = []
    for j, plane in enumerate(_PLANES):
        plane_col = F.array(*[F.lit(float(v)) for v in plane])
        sig_bits.append(
            F.when(_dot(F.col("embedding"), plane_col) > 0, F.lit(1)).otherwise(
                F.lit(0)
            ) * F.lit(1 << j)
        )
    bucket = sum(sig_bits[1:], sig_bits[0])
    bucketed = emb.select("vec_id", "label", bucket.alias("bucket"))
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.countDistinct("label").alias("n_labels"),
            F.min("vec_id").alias("min_vec_id"),
        )
    )


# --- per-label norm statistics (float, same formula both engines) ----------
def q_label_norm_stats(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    norm = _norm(F.col("embedding"))
    return (
        emb.select("label", norm.alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("norm"), 3).alias("avg_norm"),
            F.round(F.max("norm"), 3).alias("max_norm"),
        )
    )


SQL_LABEL_NORM_STATS = """
WITH t AS (
  SELECT label,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
  FROM embeddings
)
SELECT label, count(*) AS n_vecs,
       round(avg(norm), 3) AS avg_norm,
       round(max(norm), 3) AS max_norm
FROM t GROUP BY label
"""


QUERIES = {
    "ann_cosine_topk": (q_cosine_topk, SQL_COSINE_TOPK),
    "ann_lsh_buckets": (q_ann_lsh_buckets, None),
    "ann_label_norm_stats": (q_label_norm_stats, SQL_LABEL_NORM_STATS),
}
