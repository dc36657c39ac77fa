"""Corpus statistics — the `show_statistics` entry point (SURVEY.md
§3.3; /root/reference/show_statistics.py) plus the build-time stats
report (ontonotes5_to_json.py:144-188), as native aggregations.

language frequencies = A1 (utils.py:1260-1273): count per language
ordered by (-count, language); entity frequencies = A2
(utils.py:1276-1299): span counts per entity type, optionally per
language; the per-split rollup = A7 with `rollup()` supplying the
subtotal lines the reference prints manually.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def language_frequencies(annotations: DataFrame) -> DataFrame:
    """A1: records per language, ordered by (-count, language)."""
    return (
        annotations.groupBy(F.col("lang").alias("language"))
        .agg(F.count(F.lit(1)).alias("n_records"))
        .orderBy(F.desc("n_records"), "language")
    )


def entity_frequencies(annotations: DataFrame, language: str | None = None) -> DataFrame:
    """A2: span counts per entity type (optionally one language),
    ordered by (-count, type) like the reference's report."""
    df = annotations
    if language is not None:
        df = df.filter(F.col("lang") == language)
    return (
        df.select(F.explode("entities").alias("ent_type", "spans"))
        .groupBy("ent_type")
        .agg(F.sum(F.size("spans")).alias("n_spans"))
        .orderBy(F.desc("n_spans"), "ent_type")
    )


def split_rollup(routed_annotations: DataFrame) -> DataFrame:
    """A7: per split → per language → per entity type counts with
    subtotal rows via rollup (null grouping columns = totals)."""
    exploded = routed_annotations.select(
        "split", F.col("lang").alias("language"),
        F.explode("entities").alias("ent_type", "spans"),
    )
    return exploded.rollup("split", "language", "ent_type").agg(
        F.count(F.lit(1)).alias("n_label_lists"),
        F.sum(F.size("spans")).alias("n_spans"),
    )
