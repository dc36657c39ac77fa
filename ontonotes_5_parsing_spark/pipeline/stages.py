"""Core pipeline stages: extract → parse → mentions → triples.

Python touches rows exactly twice (extract, parse), both Arrow-batched;
mention reconstruction (the reference's BIO→span run-length scan, W1 at
/root/reference/ontonotes5/utils.py:738-768) and triple pattern matching
run entirely JVM-side via window functions, so they stay inside
whole-stage codegen and scale with the cluster.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kgref.extract import extract_text, split_sentences
from ..kgref.lexicon import PREDICATE_VERBS
from ..kgref.ner import tag_bio
from ..kgref.spans import get_token_bounds
from ..kgref.tokenize import tokenize_any_text
from .schemas import SENTENCES_SCHEMA


# --------------------------------------------------------------------------
# stage 1: extract_text — the byte-identity invariant stage
# --------------------------------------------------------------------------
@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    # imports kgref.extract.extract_text → distributed == single-process
    return html.map(extract_text)


def extract_stage(pages: DataFrame) -> DataFrame:
    """web_pages(url, warc_ts, html, lang) → (url, warc_ts, lang, text).

    Recomputes `text` from `html` (never trusts a pre-extracted column),
    mirroring the reference's re-parse-from-archive behavior
    (/root/reference/ontonotes5_to_json.py:97-104).
    """
    return pages.select(
        "url",
        "warc_ts",
        "lang",
        extract_text_udf(F.col("html")).alias("text"),
    )


# --------------------------------------------------------------------------
# stage 2: parse_document — the UDTF-shaped stage (1 page → N sentences)
# --------------------------------------------------------------------------
def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {k: [] for k in ("url", "sent_idx", "text", "lang", "tokens", "starts", "ends", "bio")}
        for url, lang, text in zip(pdf["url"], pdf["lang"], pdf["text"]):
            if not text:
                continue
            for sent_idx, sent in enumerate(split_sentences(text)):
                tokens = tokenize_any_text(sent)
                if not tokens:
                    continue
                bounds = get_token_bounds(sent, tokens)
                bio = tag_bio(tokens)
                out["url"].append(url)
                out["sent_idx"].append(sent_idx)
                out["text"].append(sent)
                out["lang"].append(lang)
                out["tokens"].append(tokens)
                out["starts"].append([b[0] for b in bounds])
                out["ends"].append([b[1] for b in bounds])
                out["bio"].append(bio)
        yield pd.DataFrame(out)


def parse_stage(extracted: DataFrame) -> DataFrame:
    """(url, lang, text) → sentences table (one row per sentence, token
    arrays columnar). mapInPandas keeps Arrow batching across the 1→N
    row explosion (SURVEY.md §2.10: `parse_document`).
    """
    return extracted.select("url", "lang", "text").mapInPandas(
        _parse_batches, schema=SENTENCES_SCHEMA
    )


# --------------------------------------------------------------------------
# stage 3: mentions — BIO→span run-length scan as window functions (W1)
# --------------------------------------------------------------------------
def tokens_long(sentences: DataFrame) -> DataFrame:
    """Explode the columnar token arrays into a long-form tokens table."""
    z = F.arrays_zip("tokens", "starts", "ends", "bio")
    return sentences.select(
        "url",
        "sent_idx",
        "text",
        F.posexplode(z).alias("tok_idx", "t"),
    ).select(
        "url",
        "sent_idx",
        "text",
        "tok_idx",
        F.col("t.tokens").alias("token"),
        F.col("t.starts").alias("start"),
        F.col("t.ends").alias("end"),
        F.col("t.bio").alias("bio"),
    )


def mentions_stage(sentences: DataFrame) -> DataFrame:
    """Reconstruct entity mentions from BIO tags, JVM-side.

    The run-length idiom: a running sum that ticks at every `B-` or `O`
    tag assigns a chain id; grouping by chain id yields one span per
    mention (min start, max end, type from the opening tag). Same
    semantics as the reference's sequential scan (utils.py:738-768) and
    kgref.ner.bio_to_spans.
    """
    toks = tokens_long(sentences)
    w = Window.partitionBy("url", "sent_idx").orderBy("tok_idx")
    chained = toks.withColumn(
        "chain_id",
        F.sum(
            F.when(F.col("bio").startswith("I-"), F.lit(0)).otherwise(F.lit(1))
        ).over(w),
    )
    return (
        chained.filter(F.col("bio") != "O")
        .groupBy("url", "sent_idx", "chain_id")
        .agg(
            F.min("start").alias("start"),
            F.max("end").alias("end"),
            F.min_by(F.expr("substring(bio, 3)"), F.col("tok_idx")).alias("ent_type"),
            F.max("text").alias("text"),
        )
        .select(
            "url",
            "sent_idx",
            "start",
            "end",
            F.expr("substring(text, cast(start+1 as int), cast(end-start as int))").alias(
                "surface"
            ),
            "ent_type",
        )
    )


# --------------------------------------------------------------------------
# stage 4: triples — (M, P, M) pattern over the item sequence, JVM-side
# --------------------------------------------------------------------------
def triples_stage(sentences: DataFrame, mentions: DataFrame) -> DataFrame:
    """Consecutive (MENTION, PREDICATE, MENTION) runs in the per-sentence
    item sequence → (subj, pred, obj). Implemented with `lead` windows
    (SURVEY.md §2.5) — no Python. Ground truth: kgref.triples.
    """
    toks = tokens_long(sentences)
    preds = toks.filter(
        (F.col("bio") == "O") & F.col("token").isin(list(PREDICATE_VERBS))
    ).select(
        "url",
        "sent_idx",
        "start",
        "end",
        F.col("token").alias("surface"),
        F.lit(None).cast("string").alias("ent_type"),
        F.lit("P").alias("kind"),
    )
    ments = mentions.select(
        "url", "sent_idx", "start", "end", "surface", "ent_type", F.lit("M").alias("kind")
    )
    items = ments.unionByName(preds)
    w = Window.partitionBy("url", "sent_idx").orderBy("start")
    seq = (
        items.withColumn("kind1", F.lead("kind", 1).over(w))
        .withColumn("kind2", F.lead("kind", 2).over(w))
        .withColumn("pred", F.lead("surface", 1).over(w))
        .withColumn("obj", F.lead("surface", 2).over(w))
        .withColumn("obj_type", F.lead("ent_type", 2).over(w))
        .withColumn("obj_start", F.lead("start", 2).over(w))
        .withColumn("obj_end", F.lead("end", 2).over(w))
    )
    return seq.filter(
        (F.col("kind") == "M") & (F.col("kind1") == "P") & (F.col("kind2") == "M")
    ).select(
        "url",
        "sent_idx",
        F.col("surface").alias("subj"),
        "pred",
        "obj",
        F.col("ent_type").alias("subj_type"),
        "obj_type",
        F.struct(
            F.col("start").alias("start"), F.col("end").alias("end")
        ).alias("subj_span"),
        F.struct(
            F.col("obj_start").alias("start"), F.col("obj_end").alias("end")
        ).alias("obj_span"),
    )


# --------------------------------------------------------------------------
# annotations table — the reference JSON record shape (utils.py:732-737)
# --------------------------------------------------------------------------
def annotations_stage(sentences: DataFrame, mentions: DataFrame) -> DataFrame:
    """entities map<type, array<span>> per sentence, spans sorted —
    JSON-format conformance surface (load-time checks of utils.py:1106-1257
    become testable invariants over this table).
    """
    ent_maps = (
        mentions.groupBy("url", "sent_idx", "ent_type")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("start"), F.col("end")))
            ).alias("spans")
        )
        .groupBy("url", "sent_idx")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("ent_type", "spans")))
            ).alias("entities")
        )
    )
    return (
        sentences.select("url", "sent_idx", "text", "lang")
        .join(ent_maps, ["url", "sent_idx"], "left")
        .withColumn(
            "entities",
            F.coalesce(
                F.col("entities"),
                F.from_json(F.lit("{}"), "map<string, array<struct<start:long,end:long>>>"),
            ),
        )
    )
