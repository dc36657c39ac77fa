"""Engine-runtime surfaces as driver-graded queries.

Two features of the pipeline runtime that had no driver-visible row
until round 3:

* ``lineage_resume_pending`` — the checkpoint-resume primitive
  (`pipeline.lineage.resume_filter`, the Spark mapping of the
  reference's files_with_errors bookkeeping,
  /root/reference/ontonotes5_to_json.py:80,106-107,145-151): a stage
  output with a `_lineage.json` manifest marks work as done; the
  still-pending inputs are a left-anti join against the done keys.
  The done set is materialized to a deterministic parquet path once per
  sf_dir, and the DuckDB oracle anti-joins the SAME files — both
  engines consume identical bytes, so the check verifies the resume
  semantics exactly.

* ``stream_hourly_parity`` — a Structured Streaming job graded against
  a batch SQL oracle: the events table is replayed through a
  file-source stream (one micro-batch per trigger), aggregated with a
  streaming tumbling window, flushed with ``trigger(availableNow)`` in
  complete mode, and the final in-memory sink state must equal the
  batch GROUP BY. Boundary columns are integer-exact (epoch BIGINT +
  counts) per the driver-hash protocol.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.lineage import is_complete, materialize, resume_filter

# Static oracle paths must be derivable from the SQL string, so they are
# keyed by sf_dir basename under the same root — and the SAME sf
# convention — as operators/kg.py (one definition, not two: round-3
# ADVICE flagged the hardcoded 'sf0.01' literal here).
from .kg import _ORACLE_SF, ORACLE_ROOT
from ..session import session_cache_key


def _done_dir(sf_dir: str) -> str:
    return f"{ORACLE_ROOT}/{os.path.basename(sf_dir.rstrip('/'))}/resume_done"


# --- checkpoint-resume: pending = input ANTI JOIN done ---------------------
def q_resume_pending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents still to process after a simulated completed stage.

    The "done" half is picked by a deterministic content hash
    (md5(doc_id) low bit — the same partition-independent keyed-hash
    primitive as txt_hash_sample), materialized with a lineage manifest,
    then `resume_filter` anti-joins it away. Scale shape: the done side
    is a distinct-key projection, so at 100 TB the anti-join shuffles
    only (key) pairs and AQE can broadcast a small done set.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    done_dir = _done_dir(sf_dir)
    if not is_complete(done_dir):
        done = docs.filter(
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 32, 1), 16, 10)
            .cast("int") % 2 == 0
        ).select("doc_id")
        # Write under a pid-keyed temp dir, then atomically rename into
        # place: two concurrent processes can both observe
        # is_complete()==False, and a shared-path overwrite would let
        # one read the other's half-written parquet (round-3 ADVICE).
        # rename() is atomic on one filesystem; the loser just keeps the
        # winner's completed copy.
        tmp_dir = f"{done_dir}.tmp.{os.getpid()}"
        materialize(done, tmp_dir, "resume_done")
        try:
            os.rename(tmp_dir, done_dir)
        except OSError:
            import shutil

            # A failed rename is only a benign lost race if the winner's
            # copy is actually complete. A stale manifest-less done_dir
            # (crashed pre-round-5 run) would otherwise block the rename
            # forever while resume_filter happily reads the stale parquet
            # — a persistent cross-engine mismatch (round-4 ADVICE).
            if not is_complete(done_dir):
                shutil.rmtree(done_dir, ignore_errors=True)
                os.rename(tmp_dir, done_dir)  # raise if still blocked
            else:
                shutil.rmtree(tmp_dir, ignore_errors=True)
    return resume_filter(docs, done_dir, key="doc_id").select(
        "doc_id", "lang", "n_chars"
    )


SQL_RESUME_PENDING = f"""
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d
WHERE NOT EXISTS (
  SELECT 1 FROM '{ORACLE_ROOT}/{_ORACLE_SF}/resume_done/*.parquet' done
  WHERE done.doc_id = d.doc_id
)
"""


# --- streaming/batch parity: tumbling-hour event counts --------------------
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

_STREAM_CACHE: dict[tuple[int, str], DataFrame] = {}


def q_stream_hourly_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay events through a file-source stream; the final complete-mode
    window state must equal the batch GROUP BY.

    Complete mode (not append) so no window is held back by the
    watermark at end-of-stream — parity with batch is exact and
    deterministic. Counts only at the boundary (BIGINT); the window
    start is surfaced as an epoch BIGINT. Cached per (session, sf_dir)
    so repeated grading invocations replay the stream once.
    """
    key = (session_cache_key(spark), sf_dir)
    if key not in _STREAM_CACHE:
        base = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
        view = f"stream_hourly_{base}"
        # The file stream source needs a directory of drops; respool the
        # events table into 8 files (= 8 micro-batches at
        # maxFilesPerTrigger=1) under a pid-keyed path so concurrent
        # checkouts never clobber each other's replay feed.
        feed_dir = f"/tmp/stream_feed_{os.getpid()}/{base}/events"
        if not os.path.exists(os.path.join(feed_dir, "_SUCCESS")):
            (
                spark.read.parquet(f"{sf_dir}/events.parquet")
                .repartition(8, "event_id")
                .write.mode("overwrite")
                .parquet(feed_dir)
            )
        src = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed_dir)
        )
        counts = (
            src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                # distinct aggregates are unsupported on streams; the
                # integer-exact boundary is counts + id extrema instead
                F.count(F.lit(1)).alias("n_events"),
                F.min("event_id").alias("min_event_id"),
                F.max("event_id").alias("max_event_id"),
            )
            .select(
                F.unix_timestamp(F.col("w.start")).alias("hour_epoch"),
                "event_type",
                "n_events",
                "min_event_id",
                "max_event_id",
            )
        )
        q = (
            counts.writeStream.format("memory")
            .queryName(view)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        _STREAM_CACHE[key] = spark.table(view).persist()
    return _STREAM_CACHE[key]


SQL_STREAM_HOURLY_PARITY = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       event_type,
       count(*)      AS n_events,
       min(event_id) AS min_event_id,
       max(event_id) AS max_event_id
FROM events GROUP BY 1, 2
"""


QUERIES = {
    "lineage_resume_pending": (q_resume_pending, SQL_RESUME_PENDING),
    "stream_hourly_parity": (q_stream_hourly_parity, SQL_STREAM_HOURLY_PARITY),
}
