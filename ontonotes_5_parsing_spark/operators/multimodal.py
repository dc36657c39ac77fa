"""Multimodal operator queries: binary media columns → typed features
(rows-only checks; the synthetic codec is deterministic but the decode
semantics have no SQL equivalent).

Driver-facing outputs carry NO array-typed columns: the internal API
(pipeline.media) keeps `embedding: array<float>` for downstream ANN,
but the correctness harness canonicalizes rows with pandas sort_values,
which cannot hash list cells — so these queries project the array to a
deterministic scalar digest (`md5(to_json(embedding))`) instead.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..pipeline.media import (
    audio_features,
    image_features,
    media_df,
    sample_frames,
)

N_MEDIA = 120

# Decode output materialized once per session so the embedding-ANN query
# gets a real DuckDB oracle: the decode itself is non-SQL (synthetic
# codec inside mapInPandas), but the downstream cosine top-k is plain
# math — both engines read the SAME materialized features parquet, so
# the oracle verifies the ranking semantics exactly (the kg.py pattern).
MEDIA_ORACLE_ROOT = "/tmp/media_oracle"
_MEDIA_ORACLE_SF = "sf0.01"
_MEDIA_DONE: set = set()


def _image_features_parquet(spark, sf_dir: str) -> str:
    base = f"{MEDIA_ORACLE_ROOT}/{os.path.basename(sf_dir.rstrip('/'))}"
    key = (id(spark), base)
    if key not in _MEDIA_DONE:
        image_features(media_df(spark, N_MEDIA)).select(
            "media_id", "embedding"
        ).write.mode("overwrite").parquet(f"{base}/image_features.parquet")
        _MEDIA_DONE.add(key)
    return base


def _digest_embedding(df):
    """Replace the array column with a deterministic scalar digest so
    every remaining column is hashable by the driver's canonicalizer."""
    return df.withColumn(
        "emb_digest", F.md5(F.to_json(F.col("embedding")))
    ).drop("embedding")


def q_image_features(spark, sf_dir):
    return _digest_embedding(image_features(media_df(spark, N_MEDIA)))


def q_audio_features(spark, sf_dir):
    return _digest_embedding(audio_features(media_df(spark, N_MEDIA)))


def q_video_frames(spark, sf_dir):
    """Frame-sample every video (1 row in → N frame rows out) and keep
    per-frame features — the video analog of parse_document's UDTF
    shape."""
    return _digest_embedding(sample_frames(media_df(spark, N_MEDIA)))


def q_media_embedding_topk(spark, sf_dir):
    """ANN over extracted media embeddings: brute-force cosine top-3 for
    the first 5 image embeddings — the decode→embed→search chain. The
    decoded features are materialized to parquet and BOTH engines rank
    from those files, so the cosine/top-k math is hash-verified even
    though the decode step itself is non-SQL."""
    base = _image_features_parquet(spark, sf_dir)
    feats = spark.read.parquet(f"{base}/image_features.parquet")
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda a: F.sqrt(dot(a, a))  # noqa: E731
    q = feats.filter(F.col("media_id") < 15).select(
        F.col("media_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = feats.select(F.col("media_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    cos = dot(F.col("qv"), F.col("cv")) / (norm(F.col("qv")) * norm(F.col("cv")))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "rank")
    )


SQL_MEDIA_EMBEDDING_TOPK = f"""
WITH feats AS (
  SELECT media_id, embedding
  FROM '{MEDIA_ORACLE_ROOT}/{_MEDIA_ORACLE_SF}/image_features.parquet/*.parquet'
), q AS (
  SELECT media_id AS query_id, embedding AS qv FROM feats WHERE media_id < 15
), ranked AS (
  SELECT query_id, f.media_id AS neighbor_id,
         row_number() OVER (PARTITION BY query_id
           ORDER BY list_cosine_similarity(qv, f.embedding) DESC,
                    f.media_id) AS rank
  FROM q JOIN feats f ON f.media_id <> query_id
)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 3
"""


QUERIES = {
    "media_image_features": (q_image_features, None),
    "media_audio_features": (q_audio_features, None),
    "media_video_frames": (q_video_frames, None),
    "media_embedding_topk": (q_media_embedding_topk, SQL_MEDIA_EMBEDDING_TOPK),
}
