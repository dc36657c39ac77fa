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

from pyspark.sql import functions as F

from ..pipeline.media import (
    audio_features,
    image_features,
    media_df,
    sample_frames,
)

N_MEDIA = 120


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
    the first 5 image embeddings — the decode→embed→search chain."""
    feats = image_features(media_df(spark, N_MEDIA)).select(
        "media_id", "embedding"
    )
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


QUERIES = {
    "media_image_features": (q_image_features, None),
    "media_audio_features": (q_audio_features, None),
    "media_video_frames": (q_video_frames, None),
    "media_embedding_topk": (q_media_embedding_topk, None),
}
