"""Training-data-pipeline quality operators over `documents`: C4/Gopher-
style quality filtering, within-document repetition, corpus n-gram
statistics, TF-IDF term ranking, and BPE-ish regex tokenization.

These generalize the reference's per-record text hygiene (blank guards
`/root/reference/ontonotes5/utils.py:609-611,835-840`, whitespace
squeeze `utils.py:651-656`, frequency-based label reduction
`/root/reference/reduce_entities.py:64-98`) into the document-level
filters an LLM-ingest pipeline runs before training.

Scale notes: every query is pure built-in expressions (whole-stage
codegen, no Python); per-document metrics are partition-local (no
shuffle at all until an explicit aggregate); the corpus-level n-gram
count uses explicit two-phase salted aggregation because head n-grams
("of the"-class) are exactly the skewed keys the north rule calls out.
All float outputs are either rounded fixed formulas or exact
integer-derived doubles so the DuckDB oracle hashes identically.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from .text import STOPWORDS

MIN_WORDS = 40
MAX_WORDS = 100_000
MIN_MEAN_WLEN = 3.0
MAX_MEAN_WLEN = 10.0
MIN_STOP_HITS = 2
NGRAM_TOP_N = 20
TFIDF_TOP_K = 3
# BPE-ish pre-tokenization classes (GPT-2 style, simplified to the
# subset whose semantics are identical in Java regex and RE2): runs of
# letters, runs of digits, runs of other non-space symbols.
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"


def _docs(spark: SparkSession, sf_dir: str):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --- Gopher-style quality filter flags ------------------------------------
def q_quality_filter(spark, sf_dir):
    """Per-document quality gates: word-count bounds, mean word length,
    stopword evidence, hapax ratio; `keep` = all gates pass. Flags are
    computed in one projection — at 100 TB this is a map-only scan."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n_words = F.size(toks).cast("long")
    mean_wlen = F.round(
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
        / n_words,
        4,
    )
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_hits = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).cast(
        "long"
    )
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    keep = (
        (n_words >= MIN_WORDS)
        & (n_words <= MAX_WORDS)
        & (mean_wlen >= MIN_MEAN_WLEN)
        & (mean_wlen <= MAX_MEAN_WLEN)
        & (stop_hits >= MIN_STOP_HITS)
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        stop_hits.alias("stopword_hits"),
        F.round(n_distinct / n_words, 4).alias("distinct_ratio"),
        keep.cast("boolean").alias("keep"),
    )


SQL_QUALITY_FILTER = f"""
WITH t AS (
  SELECT doc_id,
         string_split(text, ' ') AS toks,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
  FROM documents
)
SELECT doc_id,
       n_words,
       round(list_sum(list_transform(toks, x -> len(x))) / n_words, 4)
         AS mean_word_len,
       CAST(len(list_filter(toks,
              x -> x IN ({", ".join("'" + s + "'" for s in STOPWORDS)})))
            AS BIGINT) AS stopword_hits,
       round(CAST(len(list_distinct(toks)) AS BIGINT) / n_words, 4)
         AS distinct_ratio,
       (n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS}
        AND round(list_sum(list_transform(toks, x -> len(x))) / n_words, 4)
              BETWEEN {MIN_MEAN_WLEN} AND {MAX_MEAN_WLEN}
        AND CAST(len(list_filter(toks,
              x -> x IN ({", ".join("'" + s + "'" for s in STOPWORDS)})))
            AS BIGINT) >= {MIN_STOP_HITS}) AS keep
FROM t
"""


# --- within-document repetition (dup-bigram ratio) ------------------------
def q_repetition(spark, sf_dir):
    """Fraction of a document's word-bigrams taken by its single most
    frequent bigram — the Gopher "repetition" signal. The bigram
    explode is partition-local; the per-doc aggregate shuffles on
    doc_id only (no global hot key)."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    exploded = (
        docs.filter(F.size(toks) >= 2)
        .select("doc_id", F.explode(bigrams).alias("bigram"))
    )
    per_bigram = exploded.groupBy("doc_id", "bigram").agg(
        F.count(F.lit(1)).alias("c")
    )
    # Driver boundary is integer-exact: the ratio is published in basis
    # points as a BIGINT computed with half-up *integer* arithmetic
    # ((20000*max + sum) div (2*sum)) — no float round() at the hash
    # boundary, so DuckDB's HUGEINT sum() cannot diverge (the round-2
    # driver hash-fail was round(max/sum, 4) of HUGEINT intermediates).
    return per_bigram.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.max("c").alias("top_bigram_count"),
        F.expr(
            "CAST((20000 * max(c) + sum(c)) DIV (2 * sum(c)) AS BIGINT)"
        ).alias("dup_bigram_bp"),
    )


SQL_REPETITION = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) >= 2
), b AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM t
), per AS (
  SELECT doc_id, bigram, count(*) AS c FROM b GROUP BY doc_id, bigram
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_bigrams,
       max(c)                 AS top_bigram_count,
       CAST((20000 * max(c) + sum(c)) // (2 * sum(c)) AS BIGINT)
         AS dup_bigram_bp
FROM per GROUP BY doc_id
"""


# --- corpus-level top-N bigrams (salted two-phase, A3/A4 analog) ----------
def q_ngram_topk(spark, sf_dir):
    """Global bigram frequencies → top-N. Head bigrams are the skewed
    keys of the north rule: phase 1 groups by (bigram, salt) spreading
    each hot key over 32 reducers, phase 2 sums partials, and the final
    top-N is a TakeOrderedAndProject (no global sort)."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    exploded = (
        docs.filter(F.size(toks) >= 2)
        .select("doc_id", F.explode(bigrams).alias("bigram"))
        .withColumn("salt", F.pmod(F.xxhash64("doc_id"), F.lit(32)))
    )
    partial = exploded.groupBy("bigram", "salt").agg(F.count(F.lit(1)).alias("c"))
    total = partial.groupBy("bigram").agg(F.sum("c").alias("freq"))
    return total.orderBy(F.desc("freq"), "bigram").limit(NGRAM_TOP_N)


SQL_NGRAM_TOPK = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) >= 2
), b AS (
  SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM t
)
SELECT bigram, count(*) AS freq FROM b
GROUP BY bigram ORDER BY freq DESC, bigram LIMIT {NGRAM_TOP_N}
"""


# --- per-document top-K TF-IDF terms --------------------------------------
def q_tfidf_top_terms(spark, sf_dir):
    """tf·idf with idf = n_docs/df as an exact integer ratio: score =
    (tf · n_docs) / df — BIGINT product then one IEEE double division,
    bit-identical in Spark and DuckDB, so the rank order (score desc,
    term) is deterministic cross-engine. df is a two-level aggregate
    over (doc, term) distincts; the n_docs scalar is a broadcast."""
    docs = _docs(spark, sf_dir)
    terms = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.length("term") > 0)
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", (F.col("tf") * F.col("n_docs")) / F.col("df"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TFIDF_TOP_K)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round("score", 6).alias("tfidf"),
            F.col("rn").alias("rank"),
        )
    )


SQL_TFIDF_TOP_TERMS = f"""
WITH terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM terms
  WHERE len(term) > 0 GROUP BY doc_id, term
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         (tf.tf * n.n_docs) / df.df AS score,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY (tf.tf * n.n_docs) / df.df DESC,
                                     tf.term) AS rn
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, round(score, 6) AS tfidf, rn AS rank
FROM scored WHERE rn <= {TFIDF_TOP_K}
"""


# --- BPE-ish regex tokenization -------------------------------------------
def q_bpe_tokens(spark, sf_dir):
    """Token counting with a byte-pair-encoding-style pre-tokenizer
    regex (letter runs / digit runs / symbol runs) — the token-budget
    estimator of an ingest pipeline. Pure regexp_extract_all: map-only,
    no shuffle."""
    docs = _docs(spark, sf_dir)
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), F.lit(0))
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.round(
            F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
            / F.size(toks),
            4,
        ).alias("mean_token_len"),
    )


SQL_BPE_TOKENS = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS BIGINT)
         AS n_bpe_tokens,
       CAST(len(list_distinct(regexp_extract_all(text, '{BPE_PATTERN}')))
         AS BIGINT) AS n_distinct_tokens,
       round(list_sum(list_transform(regexp_extract_all(text, '{BPE_PATTERN}'),
                                     x -> len(x)))
             / len(regexp_extract_all(text, '{BPE_PATTERN}')), 4)
         AS mean_token_len
FROM documents
"""


# --- deterministic hash sampling ------------------------------------------
# Reproducible corpus sampling — the training-pipeline primitive behind
# held-out splits and ablation subsets. The sample decision is a pure
# function of the row key (md5 mod 100 < pct), so it is stable across
# engines, partitionings, and reruns — never TABLESAMPLE/rand(), which
# are partitioning-dependent. Map-only at any scale.
SAMPLE_PCT = 10


def q_hash_sample(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
            "long"
        ),
        F.lit(100),
    )
    sampled = docs.withColumn("bucket", bucket).filter(F.col("bucket") < SAMPLE_PCT)
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("n_chars").alias("sampled_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


SQL_HASH_SAMPLE = f"""
SELECT lang,
       count(*)                      AS n_sampled,
       CAST(sum(n_chars) AS BIGINT)  AS sampled_chars,
       min(doc_id)                   AS min_doc_id,
       max(doc_id)                   AS max_doc_id
FROM documents
WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
      % 100 < {SAMPLE_PCT}
GROUP BY lang
"""


QUERIES = {
    "txt_quality_filter": (q_quality_filter, SQL_QUALITY_FILTER),
    "txt_hash_sample": (q_hash_sample, SQL_HASH_SAMPLE),
    "txt_repetition": (q_repetition, SQL_REPETITION),
    "txt_ngram_topk": (q_ngram_topk, SQL_NGRAM_TOPK),
    "txt_tfidf_top_terms": (q_tfidf_top_terms, SQL_TFIDF_TOP_TERMS),
    "txt_bpe_tokens": (q_bpe_tokens, SQL_BPE_TOKENS),
}
