"""Similarity search over the `embeddings` table (vec_id,
embedding: array<float>, label).

- brute-force cosine top-k: the correctness baseline, with a DuckDB
  oracle. Output is int-only (query, neighbor, rank) — ranking is
  computed from the unrounded cosine in both engines (any monotone
  variant agrees), so no float ever reaches the hash compare.
- LSH-bucketed variant: random-hyperplane signatures → candidates only
  inside matching buckets — the scale path. Oracle-checkable: the plane
  coordinates are fixed 4-decimal rational literals both engines parse
  to identical doubles.
- per-label norm stats: float outputs, same formula both engines.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

N_QUERIES = 10
TOP_K = 5
# Embedding dimensionality, shared by the Spark plans AND every oracle
# SQL f-string (a hard-coded "generate_series(1, 64)" would silently
# truncate the dot product if the schema ever widened).
EMB_DIM = 64


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


# --- LSH-bucketed ANN (scale path) -----------------------------------------
# The hyperplane coordinates are FIXED 4-decimal rational literals (seeded
# numpy draw, rounded): both engines parse the identical decimal strings to
# the identical nearest doubles, multiply against the float32 embeddings
# promoted exactly to double, and fold the 64 products in the same order —
# so the sign bits, and hence the bucket table, are exactly reproducible in
# DuckDB. Output is int-only; no float reaches the hash compare.
N_PLANES = 6
_rng = np.random.RandomState(42)
_PLANES = _rng.standard_normal((N_PLANES, EMB_DIM)).round(4).tolist()


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


def _plane_sql_literal(plane: list[float]) -> str:
    """Render one hyperplane as a DuckDB list literal with the exact same
    decimal strings Python would print (repr of a round(4) float)."""
    return "[" + ", ".join(repr(v) for v in plane) + "]"


_SIG_TERMS = " + ".join(
    f"""(CASE WHEN list_sum(list_transform(generate_series(1, {EMB_DIM}),
        i -> CAST(embedding[i] AS DOUBLE) * ({_plane_sql_literal(p)})[i])) > 0
        THEN {1 << j} ELSE 0 END)"""
    for j, p in enumerate(_PLANES)
)
SQL_ANN_LSH_BUCKETS = f"""
WITH bucketed AS (
  SELECT vec_id, label, {_SIG_TERMS} AS bucket
  FROM embeddings
)
SELECT bucket, count(*) AS n_vecs,
       count(DISTINCT label) AS n_labels,
       min(vec_id) AS min_vec_id
FROM bucketed GROUP BY bucket
"""


# --- IVF-style ANN: centroid assignment → per-cell search ------------------
# Inverted-file ANN: (1) compute one centroid per coarse cell (avg of the
# cell's vectors, dim-by-dim — posexplode + two-phase avg, regrouped into
# an ordered array), (2) assign each query to its nearest centroid
# (broadcast of the tiny centroid table), (3) exact top-k search only
# inside the probed cell. At scale this is the standard recall/latency
# trade: the O(n) scan becomes O(n / n_cells), the candidate join is
# co-partitioned on the cell key, and the centroid table stays broadcast.
IVF_TOP_K = 5


def q_ivf_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir).select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    )
    dims = emb.select("label", F.posexplode("emb").alias("dim", "v"))
    cent = (
        dims.groupBy("label", "dim")
        .agg(F.avg("v").alias("v"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "v"))),
                lambda s: s["v"],
            ).alias("cv")
        )
    )

    def dot(u, v):
        return F.aggregate(
            F.zip_with(u, v, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    def cos(u, v):
        return dot(u, v) / (F.sqrt(dot(u, u)) * F.sqrt(dot(v, v)))

    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qv")
    )
    w_assign = Window.partitionBy("query_id").orderBy(
        F.desc("cent_cos"), "label"
    )
    probe = (
        queries.crossJoin(F.broadcast(cent))
        .withColumn("cent_cos", cos(F.col("qv"), F.col("cv")))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("query_id", "qv", F.col("label").alias("cell"))
    )
    cand = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("cell"),
        F.col("emb").alias("cv2"),
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("ncos"), "neighbor_id")
    return (
        F.broadcast(probe)
        .join(cand, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("ncos", cos(F.col("qv"), F.col("cv2")))
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= IVF_TOP_K)
        .select("query_id", "cell", "neighbor_id", "rank")
    )


SQL_IVF_TOPK = f"""
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), dims AS (
  SELECT label, dim, avg(emb[dim]) AS v
  FROM e CROSS JOIN (SELECT unnest(generate_series(1, {EMB_DIM})) AS dim) d
  GROUP BY label, dim
), cent AS (
  SELECT label, list(v ORDER BY dim) AS cv FROM dims GROUP BY label
), q AS (
  SELECT vec_id AS query_id, emb AS qv FROM e WHERE vec_id < {N_QUERIES}
), assign AS (
  SELECT query_id, qv, label AS cell,
         row_number() OVER (PARTITION BY query_id ORDER BY
           list_sum(list_transform(generate_series(1, {EMB_DIM}), i -> qv[i] * cv[i]))
           / (sqrt(list_sum(list_transform(qv, x -> x * x)))
              * sqrt(list_sum(list_transform(cv, x -> x * x)))) DESC,
           label) AS rn
  FROM q CROSS JOIN cent
), probe AS (
  SELECT query_id, qv, cell FROM assign WHERE rn = 1
), ranked AS (
  SELECT p.query_id, p.cell, e.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY p.query_id ORDER BY
           list_sum(list_transform(generate_series(1, {EMB_DIM}),
                                   i -> p.qv[i] * e.emb[i]))
           / (sqrt(list_sum(list_transform(p.qv, x -> x * x)))
              * sqrt(list_sum(list_transform(e.emb, x -> x * x)))) DESC,
           e.vec_id) AS rank
  FROM probe p JOIN e ON e.label = p.cell AND e.vec_id <> p.query_id
)
SELECT query_id, cell, neighbor_id, rank FROM ranked WHERE rank <= {IVF_TOP_K}
"""


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
    "ann_lsh_buckets": (q_ann_lsh_buckets, SQL_ANN_LSH_BUCKETS),
    "ann_ivf_topk": (q_ivf_topk, SQL_IVF_TOPK),
    "ann_label_norm_stats": (q_label_norm_stats, SQL_LABEL_NORM_STATS),
}
