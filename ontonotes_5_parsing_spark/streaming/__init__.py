"""streaming — Structured Streaming forms of the engine's operators.

The reference is strictly batch (SURVEY.md §2.9) and the north rule
requires checkpoint-resumable *batch*; these streaming forms exist
because the engine's input is naturally a feed (`warc_ts` is event
time) and every stage of the DAG is `foreachBatch`-compatible. Covered:

- `stream_pages_to_triples`: the extraction DAG as a streaming query
  (file/rate source → fused Arrow UDF stage → triples sink).
- `windowed_mention_counts`: watermarked tumbling-window aggregation.
- `foreach_batch_pipeline`: micro-batch driver reusing the batch DAG.
- `streaming_dedup_pages`: watermark-bounded-state streaming exact
  dedup (dropDuplicatesWithinWatermark).
"""

from .jobs import (
    stream_pages_to_triples,
    windowed_mention_counts,
    foreach_batch_pipeline,
    stateful_entity_totals,
    streaming_dedup_pages,
)

__all__ = [
    "stream_pages_to_triples",
    "windowed_mention_counts",
    "foreach_batch_pipeline",
    "stateful_entity_totals",
    "streaming_dedup_pages",
]
