"""Multimodal operator queries: binary media columns → typed features.

All four queries are DuckDB-hash-checked. The synthetic payloads are
Mersenne-Twister-generated (not SQL-reproducible), so the raw media
table (media_id, kind, payload) is materialized ONCE to parquet and
both engines start from the same bytes — then the oracle *decodes the
payload independently in SQL* (hex-parse of the little-endian headers
and per-byte sums), so the Spark-side numpy decode is genuinely
cross-checked, not echoed.

Driver-facing outputs carry no array columns and no float32-derived
values: floats at the driver boundary are doubles recomputed
relationally from the exact integer aggregates (px_sum / sq_sum) the
UDFs emit, because a float32 roundtrip perturbs the 6th decimal the
driver's value hash formats. The embedding arrays stay in the internal
API (pipeline.media) and are hash-verified end-to-end by
media_embedding_topk via the materialized-features parquet.
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
from ..session import session_cache_key

N_MEDIA = 120

MEDIA_ORACLE_ROOT = "/tmp/media_oracle"
_MEDIA_ORACLE_SF = "sf0.01"
_MEDIA_DONE: set = set()


def _materialize_media(spark, sf_dir: str) -> str:
    """Write the raw media table + decoded image features to parquet
    once per session; every media query (Spark and DuckDB) reads from
    these files so both engines see identical payload bytes."""
    base = f"{MEDIA_ORACLE_ROOT}/{os.path.basename(sf_dir.rstrip('/'))}"
    key = (session_cache_key(spark), base)
    if key not in _MEDIA_DONE:
        media = media_df(spark, N_MEDIA).persist()
        media.select("media_id", "kind", "payload").write.mode(
            "overwrite"
        ).parquet(f"{base}/media.parquet")
        image_features(media).select("media_id", "embedding").write.mode(
            "overwrite"
        ).parquet(f"{base}/image_features.parquet")
        media.unpersist()
        _MEDIA_DONE.add(key)
    return base


def _media(spark, sf_dir: str):
    base = _materialize_media(spark, sf_dir)
    return spark.read.parquet(f"{base}/media.parquet")


# --- SQL codec: hex-parse the synthetic container formats ------------------
def _byte(i: str) -> str:
    """1-based byte i of the payload, via the hex projection `hx`."""
    return f"('0x' || substr(hx, 2*({i})-1, 2))::BIGINT"


def _u32le(off: int) -> str:
    """Little-endian uint32 at 1-based byte offset `off`."""
    return " + ".join(
        f"{1 << (8 * j)}*{_byte(str(off + j))}" for j in range(4)
    )


def q_image_features(spark, sf_dir):
    """Decode + feature-extract images; driver projection is header
    metadata + exact pixel-sum aggregates + a double mean derived from
    them (BIGINT division → bit-identical across engines)."""
    feats = image_features(_media(spark, sf_dir))
    return feats.select(
        "media_id",
        "width",
        "height",
        "n_channels",
        "px_sum",
        "n_px",
        F.round(F.col("px_sum") / F.col("n_px"), 4).alias("mean_px"),
    )


SQL_IMAGE_FEATURES = f"""
WITH m AS (
  SELECT media_id, hex(payload) AS hx, octet_length(payload) AS n
  FROM '{MEDIA_ORACLE_ROOT}/{_MEDIA_ORACLE_SF}/media.parquet/*.parquet'
  WHERE kind = 'image'
), hdr AS (
  SELECT media_id, hx, n,
         {_u32le(5)} AS width,
         {_u32le(9)} AS height,
         {_u32le(13)} AS n_channels
  FROM m
)
SELECT media_id, width, height, n_channels,
       list_sum(list_transform(generate_series(17, n),
                               i -> {_byte('i')}))::BIGINT AS px_sum,
       (n - 16)::BIGINT                                    AS n_px,
       round(list_sum(list_transform(generate_series(17, n),
                                     i -> {_byte('i')}))::BIGINT
             / (n - 16), 4)                                AS mean_px
FROM hdr
"""


def q_audio_features(spark, sf_dir):
    """Decode audio; rms is recomputed as a double from the exact
    int64 sum of squares (identical IEEE ops in both engines)."""
    feats = audio_features(_media(spark, sf_dir))
    return feats.select(
        "media_id",
        "sample_rate",
        "n_samples",
        "sq_sum",
        F.round(F.sqrt(F.col("sq_sum") / F.col("n_samples")), 3).alias("rms"),
    )


SQL_AUDIO_FEATURES = f"""
WITH m AS (
  SELECT media_id, hex(payload) AS hx, octet_length(payload) AS n
  FROM '{MEDIA_ORACLE_ROOT}/{_MEDIA_ORACLE_SF}/media.parquet/*.parquet'
  WHERE kind = 'audio'
), hdr AS (
  SELECT media_id, hx,
         {_u32le(5)} AS sample_rate,
         {_u32le(9)} AS n_samples
  FROM m
), sq AS (
  SELECT media_id, sample_rate, n_samples,
         -- int16 LE at sample s (0-based): bytes 13+2s, 14+2s; sign-fold
         list_sum(list_transform(generate_series(0, n_samples - 1), s ->
           CASE WHEN {_byte('14+2*s')} >= 128
                THEN ({_byte('13+2*s')} + 256*{_byte('14+2*s')} - 65536)
                     * ({_byte('13+2*s')} + 256*{_byte('14+2*s')} - 65536)
                ELSE ({_byte('13+2*s')} + 256*{_byte('14+2*s')})
                     * ({_byte('13+2*s')} + 256*{_byte('14+2*s')})
           END))::BIGINT AS sq_sum
  FROM hdr
)
SELECT media_id, sample_rate, n_samples, sq_sum,
       round(sqrt(sq_sum / n_samples), 3) AS rms
FROM sq
"""


def q_video_frames(spark, sf_dir):
    """Frame-sample every video (1 row in → N frame rows out, the
    UDTF-shaped media op); driver projection is per-frame header
    metadata + exact pixel sums + doubles derived from integers."""
    frames = sample_frames(_media(spark, sf_dir))
    return frames.select(
        "media_id",
        "frame_idx",
        "fps",
        F.round(F.col("frame_idx") / F.col("fps"), 4).alias("ts_offset_sec"),
        "width",
        "height",
        "px_sum",
        "n_px",
        F.round(F.col("px_sum") / F.col("n_px"), 4).alias("mean_px"),
    )


SQL_VIDEO_FRAMES = f"""
WITH m AS (
  SELECT media_id, hex(payload) AS hx
  FROM '{MEDIA_ORACLE_ROOT}/{_MEDIA_ORACLE_SF}/media.parquet/*.parquet'
  WHERE kind = 'video'
), hdr AS (
  SELECT media_id, hx,
         {_u32le(5)} AS nf,
         {_u32le(9)} AS w,
         {_u32le(13)} AS h,
         {_u32le(17)} AS fps
  FROM m
), fr AS (
  -- every 4th frame incl. frame 0 (sample_frames' every_k=4)
  SELECT media_id, hx, w, h, fps,
         unnest(generate_series(0, nf - 1, 4)) AS frame_idx
  FROM hdr
)
SELECT media_id, frame_idx, fps,
       round(frame_idx / fps, 4) AS ts_offset_sec,
       w AS width, h AS height,
       list_sum(list_transform(
         generate_series(21 + frame_idx*w*h, 20 + (frame_idx + 1)*w*h),
         i -> {_byte('i')}))::BIGINT AS px_sum,
       (w*h)::BIGINT                 AS n_px,
       round(list_sum(list_transform(
         generate_series(21 + frame_idx*w*h, 20 + (frame_idx + 1)*w*h),
         i -> {_byte('i')}))::BIGINT / (w*h), 4) AS mean_px
FROM fr
"""


def q_media_embedding_topk(spark, sf_dir):
    """ANN over extracted media embeddings: brute-force cosine top-3 for
    the first 5 image embeddings — the decode→embed→search chain. The
    decoded features are materialized to parquet and BOTH engines rank
    from those files, so the cosine/top-k math is hash-verified even
    though the embedding step itself is non-SQL."""
    base = _materialize_media(spark, sf_dir)
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
    "media_image_features": (q_image_features, SQL_IMAGE_FEATURES),
    "media_audio_features": (q_audio_features, SQL_AUDIO_FEATURES),
    "media_video_frames": (q_video_frames, SQL_VIDEO_FRAMES),
    "media_embedding_topk": (q_media_embedding_topk, SQL_MEDIA_EMBEDDING_TOPK),
}
