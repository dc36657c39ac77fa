"""Text-analysis operators over the `documents` webtext table —
token counting, quality scoring, fingerprinting, vocabulary reduction,
split routing (F-ops of SURVEY.md §2.8 + J1/J2/A-ops generalized).

All Spark implementations are pure built-ins (split / higher-order
array functions / md5 / levenshtein) so they stay in whole-stage
codegen; every oracle recomputes the same formula so float arithmetic
matches.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "and", "of", "to", "in"]


def _docs(spark: SparkSession, sf_dir: str):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --- token counting + quality scoring (F1/F16 analog) --------------------
def q_token_stats(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n = F.size(toks).cast("long")
    total_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).cast("long")
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(total_len / n, 4).alias("avg_token_len"),
        F.round(n_stop / n, 4).alias("stopword_ratio"),
    )


SQL_TOKEN_STATS = f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       round(list_sum(list_transform(string_split(text, ' '), x -> len(x)))
             / len(string_split(text, ' ')), 4)     AS avg_token_len,
       round(CAST(len(list_filter(string_split(text, ' '),
                       x -> x IN ({", ".join("'" + s + "'" for s in STOPWORDS)})))
             AS BIGINT)
             / len(string_split(text, ' ')), 4)     AS stopword_ratio
FROM documents
"""


# --- language frequency stats (A1 analog: utils.py:1260-1273) ------------
def q_lang_frequencies(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            # integer-exact mean (milli-chars, half-up integer division):
            # round(avg(BIGINT),4) is the HUGEINT-intermediate class that
            # hash-failed evt_json_props at the round-2 driver gate
            F.expr(
                "CAST((2000 * sum(n_chars) + count(1)) DIV (2 * count(1)) "
                "AS BIGINT)"
            ).alias("avg_chars_milli"),
        )
    )


SQL_LANG_FREQUENCIES = """
SELECT lang,
       count(*)                     AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST((2000 * sum(n_chars) + count(*)) // (2 * count(*)) AS BIGINT)
         AS avg_chars_milli
FROM documents GROUP BY lang
"""


# --- character-class quality profile (quality scoring) -------------------
def q_char_classes(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    text = F.col("text")
    return docs.select(
        "doc_id",
        F.length(text).alias("n_chars_actual"),
        (F.length(text) - F.length(F.regexp_replace(text, r"[a-zA-Z]", ""))).alias(
            "n_alpha"
        ),
        (F.length(text) - F.length(F.regexp_replace(text, r"[0-9]", ""))).alias(
            "n_digit"
        ),
        (F.length(text) - F.length(F.regexp_replace(text, r"\s", ""))).alias(
            "n_space"
        ),
    )


SQL_CHAR_CLASSES = r"""
SELECT doc_id,
       len(text)                                          AS n_chars_actual,
       len(text) - len(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS n_alpha,
       len(text) - len(regexp_replace(text, '[0-9]', '', 'g'))    AS n_digit,
       len(text) - len(regexp_replace(text, '\s', '', 'g'))       AS n_space
FROM documents
"""


# --- document fingerprinting (rolling-hash analog, exact form) ------------
def q_fingerprints(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    fp = F.md5(F.col("text"))
    w = Window.partitionBy(fp)
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.count(F.lit(1)).over(w).alias("n_same_fp"),
    )


SQL_FINGERPRINTS = """
SELECT doc_id,
       md5(text)                                  AS fingerprint,
       count(*) OVER (PARTITION BY md5(text))     AS n_same_fp
FROM documents
"""


# --- vocabulary reduction (reduce_entities lifecycle §3.2 as one query) ---
# global token freq (A3) → top-N seeds (A4) → nearest-seed assignment by
# edit distance (J2) with deterministic ties → cluster table.
def q_vocab_reduce(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    tokens = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.length("token") > 0)
    freq = tokens.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    seeds = (
        freq.orderBy(F.desc("freq"), "token")
        .limit(10)
        .select(F.col("token").alias("seed"))
    )
    rare = freq.filter(F.col("freq") >= 20).join(seeds, freq.token == seeds.seed, "left_anti")
    scored = rare.crossJoin(F.broadcast(seeds)).withColumn(
        "dist", F.levenshtein("token", "seed")
    )
    w = Window.partitionBy("token").orderBy("dist", "seed")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("token", "seed", "dist")
    )


SQL_VOCAB_REDUCE = """
WITH freq AS (
  SELECT token, count(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  WHERE len(token) > 0
  GROUP BY token
), seeds AS (
  SELECT token AS seed FROM freq ORDER BY freq DESC, token LIMIT 10
), rare AS (
  SELECT token FROM freq
  WHERE freq >= 20 AND token NOT IN (SELECT seed FROM seeds)
), scored AS (
  SELECT token, seed, levenshtein(token, seed) AS dist,
         row_number() OVER (PARTITION BY token
                            ORDER BY levenshtein(token, seed), seed) AS rn
  FROM rare CROSS JOIN seeds
)
SELECT token, seed, dist FROM scored WHERE rn = 1
"""


# --- language-ID by character-trigram profile (n-gram heuristic) ----------
# Classic n-gram language identification, fully relational: (1) "train"
# per-language trigram profiles from the corpus itself (top-PROFILE_N
# trigrams per lang — tiny, broadcastable), (2) score every document's
# trigram occurrences against each profile, (3) predict = argmax hits
# with a deterministic tie-break. Generalizes the reference's
# path-derived language tagging (`/root/reference/ontonotes5/utils.py:
# 986-999`) into a content-based classifier. At scale the trigram
# explode is partition-local and the profile join is a broadcast —
# the only shuffles are the two-phase count aggregations.
PROFILE_N = 20


def q_langid(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    grams = docs.select(
        "doc_id",
        "lang",
        # guard: for text shorter than 3 chars, F.sequence(1, len-2)
        # would generate a DESCENDING sequence (start > stop) and emit
        # spurious trigrams at zero/negative positions, while DuckDB's
        # generate_series returns empty — emit an empty array so both
        # engines agree (explode drops the row either way)
        F.explode(
            F.when(
                F.length("text") >= 3,
                F.transform(
                    F.sequence(F.lit(1), F.length("text") - 2),
                    lambda i: F.col("text").substr(i, F.lit(3)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )
    w_prof = Window.partitionBy("lang").orderBy(F.desc("c"), "g")
    profile = (
        grams.groupBy("lang", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rn", F.row_number().over(w_prof))
        .filter(F.col("rn") <= PROFILE_N)
        .select(F.col("lang").alias("plang"), "g")
    )
    scored = (
        grams.join(F.broadcast(profile), "g")
        .groupBy("doc_id", "lang", "plang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    w_doc = Window.partitionBy("doc_id").orderBy(F.desc("hits"), "plang")
    return (
        scored.withColumn("rn", F.row_number().over(w_doc))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id", "lang", F.col("plang").alias("predicted_lang"), "hits"
        )
    )


SQL_LANGID = f"""
WITH grams AS (
  SELECT doc_id, lang,
         unnest(list_transform(generate_series(1, len(text)-2),
                               i -> substr(text, i, 3))) AS g
  FROM documents
), prof AS (
  SELECT lang AS plang, g FROM (
    SELECT lang, g,
           row_number() OVER (PARTITION BY lang
                              ORDER BY count(*) DESC, g) AS rn
    FROM grams GROUP BY lang, g
  ) WHERE rn <= {PROFILE_N}
), scored AS (
  SELECT gr.doc_id, gr.lang, p.plang, count(*) AS hits
  FROM grams gr JOIN prof p USING (g)
  GROUP BY gr.doc_id, gr.lang, p.plang
), ranked AS (
  SELECT doc_id, lang, plang AS predicted_lang, hits,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY hits DESC, plang) AS rn
  FROM scored
)
SELECT doc_id, lang, predicted_lang, hits FROM ranked WHERE rn = 1
"""


# --- split routing (J1 broadcast semi-join analog, utils.py:952-983) ------
_SPLIT_MAP = [(str(d), "train" if d < 7 else ("development" if d < 9 else "test"))
              for d in range(10)]


def q_split_routing(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    split_map = spark.createDataFrame(_SPLIT_MAP, ["last_digit", "split"])
    routed = docs.withColumn(
        "last_digit", F.substring(F.col("source"), -1, 1)
    ).join(F.broadcast(split_map), "last_digit", "left")
    return routed.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
    )


SQL_SPLIT_ROUTING = """
WITH split_map(last_digit, split) AS (
  VALUES ('0','train'),('1','train'),('2','train'),('3','train'),
         ('4','train'),('5','train'),('6','train'),
         ('7','development'),('8','development'),('9','test')
)
SELECT split, count(*) AS n_docs, count(DISTINCT source) AS n_sources
FROM documents
LEFT JOIN split_map ON right(source, 1) = last_digit
GROUP BY split
"""


QUERIES = {
    "txt_token_stats": (q_token_stats, SQL_TOKEN_STATS),
    "txt_lang_frequencies": (q_lang_frequencies, SQL_LANG_FREQUENCIES),
    "txt_char_classes": (q_char_classes, SQL_CHAR_CLASSES),
    "txt_fingerprints": (q_fingerprints, SQL_FINGERPRINTS),
    "txt_vocab_reduce": (q_vocab_reduce, SQL_VOCAB_REDUCE),
    "txt_langid": (q_langid, SQL_LANGID),
    "txt_split_routing": (q_split_routing, SQL_SPLIT_ROUTING),
}
