"""Structured Streaming jobs over web_pages feeds.

Event time is `warc_ts` (BASELINE.json:15). All jobs run with
`trigger(availableNow=True)` in tests — process everything pending,
then stop — which is also the production shape for incremental
snapshot processing (the batch-resume analog of lineage.resume_filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.schemas import WEB_PAGES_SCHEMA
from ..pipeline.stages import extract_parse_stage, mentions_from_parsed, triples_from_parsed


def read_pages_stream(spark: SparkSession, pages_dir: str) -> DataFrame:
    """File-source stream of web_pages parquet drops (new files = new
    micro-batches), schema pinned (never inferred)."""
    return (
        spark.readStream.schema(WEB_PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(pages_dir)
    )


def stream_pages_to_triples(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """pages stream → fused extract/parse/annotate → triples sink.

    The same Arrow UDF stage as batch (stateless row transform →
    streaming-safe); append-mode parquet sink with exactly-once via the
    checkpoint dir.
    """
    pages = read_pages_stream(spark, pages_dir)
    parsed = extract_parse_stage(pages, lean=True, coref=True)
    triples = triples_from_parsed(parsed)
    return (
        triples.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def windowed_mention_counts(
    spark: SparkSession,
    pages_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Watermarked tumbling-window mention counts per entity type.

    Late pages beyond the watermark are dropped; state is bounded —
    the streaming analog of A2 (entity frequencies, SURVEY.md §2.4).
    Returns a started query writing to an in-memory sink named
    'mention_counts'.
    """
    pages = read_pages_stream(spark, pages_dir)
    parsed = extract_parse_stage(pages, lean=True, coref=True)
    # carry event time through the parse by re-joining the page feed's
    # timestamp on url (stream-static joins need a static side; instead
    # propagate warc_ts inside the UDF? — simpler: mention rows keep the
    # url, and the page timestamp column is added before parsing)
    mentions = mentions_from_parsed(parsed)
    ts_by_url = pages.select("url", "warc_ts")
    with_ts = mentions.join(ts_by_url, "url")
    counts = (
        with_ts.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "ent_type")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .select(
            F.col("w.start").alias("window_start"),
            "ent_type",
            "n_mentions",
        )
    )
    return (
        counts.writeStream.format("memory")
        .queryName("mention_counts")
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def foreach_batch_pipeline(
    spark: SparkSession,
    pages_dir: str,
    work_dir: str,
    checkpoint_dir: str,
):
    """Micro-batch driver: every batch of new pages runs the triple
    stages and appends to the triples table — the streaming form of
    checkpoint-resumable batch (BASELINE.json:14). Linking /
    canonicalization stay periodic batch jobs over the accumulated
    table (they are global aggregations, not per-batch transforms).
    """
    pages = read_pages_stream(spark, pages_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        parsed = extract_parse_stage(batch_df, lean=True, coref=True)
        triples = triples_from_parsed(parsed)
        triples.write.mode("append").parquet(f"{work_dir}/triples")

    return (
        pages.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
