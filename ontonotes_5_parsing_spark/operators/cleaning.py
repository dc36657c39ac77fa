"""Corpus-cleaning operators an LLM-ingest pipeline runs before
training: benchmark-contamination detection and corpus-level
exact-substring deduplication.

These extend the engine's dedup/quality families (SURVEY.md §2 scope:
"the operations a large-scale training-data pipeline would need")
beyond what the reference ships; the reference's closest analog is its
frequency-based label reduction (/root/reference/reduce_entities.py:64-98),
which reduces a vocabulary rather than a corpus.

* ``clean_contamination`` — the GPT-3/PaLM-style n-gram overlap check:
  flag training documents that share any 5-gram with a held-out
  benchmark set. At 100 TB the benchmark side is tiny by construction
  (eval suites are MBs, the corpus is TBs), so the check is a
  broadcast semi-join: the corpus side stays a map-only scan with no
  shuffle until the final per-document aggregate (keyed by doc_id —
  no skew).

* ``dedup_chunk_unique`` — exact-substring dedup at chunk granularity
  (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
  Better", the practical paragraph/window variant): split every
  document into non-overlapping 8-token chunks, keep only the FIRST
  occurrence of each chunk corpus-wide (ordered by doc_id, position),
  and re-emit per-document stats plus the md5 of the cleaned text.
  One shuffle keyed by chunk string (the dedup key — fan-in per key is
  bounded by the number of docs sharing a chunk), one window
  row_number per chunk group, one keyed re-aggregation by doc_id. No
  suffix array needed: fixed chunk boundaries make the problem
  relational, which is what survives 1000 executors.

Every output column is an exact integer, string, or md5 hex digest —
no floats anywhere at the driver hash boundary (the round-2
txt_repetition lesson: rounded HUGEINT-derived ratios diverge across
engines).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

# benchmark set = documents with doc_id < BENCH_CUTOFF (a deterministic
# stand-in for a held-out eval suite; at any sf the cutoff keeps the
# benchmark side broadcast-sized)
BENCH_CUTOFF = 50
NGRAM = 5
CHUNK = 8


def _docs(spark: SparkSession, sf_dir: str):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_contamination(spark, sf_dir):
    """Training docs sharing ≥1 5-gram with the benchmark docs.

    Output: (doc_id, n_grams, contam_hits, contam_grams) for
    contaminated docs only — positional hits and distinct contaminated
    grams, all exact BIGINTs.
    """
    docs = _docs(spark, sf_dir).withColumn("toks", F.split("text", " "))
    grams = docs.filter(F.size("toks") >= NGRAM).select(
        "doc_id",
        (F.size("toks") - (NGRAM - 1)).cast("long").alias("n_grams"),
        F.explode(
            F.expr(
                f"transform(sequence(1, size(toks) - {NGRAM - 1}),"
                f" i -> array_join(slice(toks, i, {NGRAM}), ' '))"
            )
        ).alias("gram"),
    )
    bench = (
        grams.filter(F.col("doc_id") < BENCH_CUTOFF).select("gram").distinct()
    )
    train = grams.filter(F.col("doc_id") >= BENCH_CUTOFF)
    return (
        train.join(F.broadcast(bench), "gram")
        .groupBy("doc_id", "n_grams")
        .agg(
            F.count(F.lit(1)).alias("contam_hits"),
            F.countDistinct("gram").alias("contam_grams"),
        )
        .select("doc_id", "n_grams", "contam_hits", "contam_grams")
    )


SQL_CONTAMINATION = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) >= {NGRAM}
), g AS (
  SELECT doc_id, len(toks) - {NGRAM - 1} AS n_grams,
         unnest(list_transform(generate_series(1, len(toks) - {NGRAM - 1}),
                i -> array_to_string(toks[i:i + {NGRAM - 1}], ' '))) AS gram
  FROM t
), bench AS (
  SELECT DISTINCT gram FROM g WHERE doc_id < {BENCH_CUTOFF}
)
SELECT g.doc_id, g.n_grams,
       count(*)::BIGINT AS contam_hits,
       count(DISTINCT g.gram)::BIGINT AS contam_grams
FROM g JOIN bench USING (gram)
WHERE g.doc_id >= {BENCH_CUTOFF}
GROUP BY g.doc_id, g.n_grams
"""


def q_chunk_unique(spark, sf_dir):
    """Corpus-wide exact chunk dedup: first occurrence of each 8-token
    chunk (by doc_id, then position) survives; per-doc stats + md5 of
    the cleaned, re-joined text.

    Output: (doc_id, n_chunks, n_dup_chunks, clean_md5).
    """
    docs = _docs(spark, sf_dir).withColumn("toks", F.split("text", " "))
    chunks = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, cast(ceil(size(toks) / {CHUNK}.0) as int) - 1),"
                f" j -> array_join(slice(toks, j * {CHUNK} + 1, {CHUNK}), ' '))"
            )
        ).alias("pos", "chunk"),
    )
    w = Window.partitionBy("chunk").orderBy("doc_id", "pos")
    ranked = chunks.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("rn") > 1).cast("long")).alias("n_dup_chunks"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("rn") == 1,
                                    F.struct("pos", "chunk"),
                                )
                            )
                        ),
                        lambda x: x["chunk"],
                    ),
                    " ",
                )
            ).alias("clean_md5"),
        )
        .select("doc_id", "n_chunks", "n_dup_chunks", "clean_md5")
    )


SQL_CHUNK_UNIQUE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), c AS (
  SELECT doc_id, j.j AS pos,
         array_to_string(toks[j.j * {CHUNK} + 1 : j.j * {CHUNK} + {CHUNK}], ' ') AS chunk
  FROM t, LATERAL (
    SELECT unnest(range(0, CAST(ceil(len(toks) / {CHUNK}.0) AS BIGINT))) AS j
  ) j
), r AS (
  SELECT doc_id, pos, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
  FROM c
)
SELECT doc_id,
       count(*)::BIGINT AS n_chunks,
       sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_chunks,
       md5(coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY pos), ''))
         AS clean_md5
FROM r GROUP BY doc_id
"""


QUERIES = {
    "clean_contamination": (q_contamination, SQL_CONTAMINATION),
    "dedup_chunk_unique": (q_chunk_unique, SQL_CHUNK_UNIQUE),
}
