"""`.onf` corpus source — the distributed `ontonotes5_to_json`
(/root/reference/ontonotes5_to_json.py, SURVEY.md §3.1).

Stage mapping:

| reference                                  | here                        |
|--------------------------------------------|-----------------------------|
| tgz member scan + `.onf` filter (S1/S2/P1) | binaryFile scan with pathGlobFilter |
| per-doc parse loop (stage 4)               | mapInPandas over kgref.onf.parse_onf |
| language from path (F15)                   | same kernel, as a column    |
| id-list load (S3)                          | spark.read.text + input_file_name |
| split routing endswith semi-join (J1)      | path-suffix explode → broadcast equi-join, first-match priority |
| seeded shuffle + JSON dump (O1/S5)         | dataset_io.write_json_dataset |
| files_with_errors bookkeeping              | `error` column + observe    |
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kgref.onf import get_language_by_filename, parse_onf

ONF_RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("doc_key", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("sent_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField(
            "morphology",
            T.MapType(T.StringType(), T.ArrayType(
                T.StructType([T.StructField("start", T.LongType()), T.StructField("end", T.LongType())])
            )),
            False,
        ),
        T.StructField(
            "syntax",
            T.MapType(T.StringType(), T.ArrayType(
                T.StructType([T.StructField("start", T.LongType()), T.StructField("end", T.LongType())])
            )),
            False,
        ),
        T.StructField(
            "entities",
            T.MapType(T.StringType(), T.ArrayType(
                T.StructType([T.StructField("start", T.LongType()), T.StructField("end", T.LongType())])
            )),
            False,
        ),
        T.StructField("error", T.StringType(), True),
    ]
)


def _doc_key(path: str) -> str:
    """Document key = path without scheme/extension — the grain the id
    lists address (`check_onf_name` strips '.onf', utils.py:952-966)."""
    p = path.split("://", 1)[-1]
    if p.endswith(".onf"):
        p = p[: -len(".onf")]
    return p


def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            text = bytes(content).decode("utf-8", errors="ignore")
            records, err = parse_onf(text, path)
            lang = get_language_by_filename(path)
            key = _doc_key(path)
            for sent_idx, rec in enumerate(records):
                rows.append(
                    {
                        "path": path,
                        "doc_key": key,
                        "lang": lang,
                        "sent_idx": sent_idx,
                        "text": rec["text"],
                        "morphology": {
                            k: [{"start": s, "end": e} for s, e in v]
                            for k, v in rec["morphology"].items()
                        },
                        "syntax": {
                            k: [{"start": s, "end": e} for s, e in v]
                            for k, v in rec["syntax"].items()
                        },
                        "entities": {
                            k: [{"start": s, "end": e} for s, e in v]
                            for k, v in rec["entities"].items()
                        },
                        "error": err or None,
                    }
                )
            if not records and err:
                rows.append(
                    {
                        "path": path, "doc_key": key, "lang": lang, "sent_idx": -1,
                        "text": "", "morphology": {}, "syntax": {}, "entities": {},
                        "error": err,
                    }
                )
        yield pd.DataFrame(
            rows,
            columns=[f.name for f in ONF_RECORDS_SCHEMA.fields],
        )


def onf_annotations(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """Scan `.onf` files (S1: pathGlobFilter pushes the suffix filter to
    the file index) and parse each document to annotated sentences."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.onf")
        .option("recursiveFileLookup", "true")
        .load(corpus_dir)
        .select("path", "content")
    )
    parallelism = max(spark.sparkContext.defaultParallelism, 4)
    return files.repartition(parallelism).mapInPandas(
        _parse_batches, schema=ONF_RECORDS_SCHEMA
    )


def load_split_ids(spark: SparkSession, ids_dir: str) -> DataFrame:
    """Read `{train,development,test}.id` line files recursively (S3,
    `parse_splitting` utils.py:886-937) → (doc_id, split, priority)."""
    lines = (
        spark.read.text(ids_dir, recursiveFileLookup=True)
        .withColumn("src", F.input_file_name())
        .filter(F.length(F.trim("value")) > 0)
    )
    split = (
        F.when(F.col("src").endswith("train.id"), "train")
        .when(F.col("src").endswith("development.id"), "validation")
        .when(F.col("src").endswith("test.id"), "test")
    )
    priority = (
        F.when(F.col("src").endswith("train.id"), 0)
        .when(F.col("src").endswith("development.id"), 1)
        .otherwise(2)
    )
    return (
        lines.select(
            F.trim("value").alias("doc_id"),
            split.alias("split"),
            priority.alias("priority"),
        )
        .filter(F.col("split").isNotNull())
        .distinct()
    )


def route_by_id_lists(annotations: DataFrame, split_ids: DataFrame) -> DataFrame:
    """J1: the reference routes each doc by first-match `endswith`
    against the train/dev/test id lists (`check_onf_name`,
    utils.py:952-983). The scalable form: explode each doc_key into its
    path suffixes (bounded by path depth) and broadcast equi-join the id
    table on the suffix, taking the highest-priority match — exactly
    first-match semantics, shuffle-free on the fact side.

    Unmatched docs get split = NULL (the reference raises; the engine
    surfaces them for the caller to count via observe / filter).
    """
    suffixes = F.expr(
        """
        transform(
          sequence(1, size(split(doc_key, '/'))),
          i -> array_join(slice(split(doc_key, '/'), i,
                                size(split(doc_key, '/')) - i + 1), '/'))
        """
    )
    exploded = annotations.withColumn("suffix", F.explode(suffixes))
    joined = exploded.join(
        F.broadcast(split_ids),
        exploded.suffix == split_ids.doc_id,
        "left",
    )
    w_cols = [c for c in annotations.columns]
    best = (
        joined.groupBy(*w_cols)
        .agg(F.min_by("split", F.coalesce("priority", F.lit(99))).alias("split"))
    )
    return best


def onf_to_json(
    spark: SparkSession,
    corpus_dir: str,
    ids_dir: str | None,
    out_path: str,
    seed: int = 42,
) -> dict:
    """The full `ontonotes5_to_json` lifecycle: scan → parse → route →
    seeded-shuffle JSON sink; returns the stats report (counts per
    split/lang + parse-error count — the reference's stdout report,
    ontonotes5_to_json.py:144-188)."""
    ann = onf_annotations(spark, corpus_dir).persist()
    errors = ann.filter(F.col("error").isNotNull())
    good = ann.filter(F.col("error").isNull()).drop("error")
    if ids_dir is not None:
        routed = route_by_id_lists(good, load_split_ids(spark, ids_dir))
        routed = routed.withColumn("split", F.coalesce("split", F.lit("train")))
    else:
        from ..pipeline.dataset_io import route_splits

        routed = route_splits(
            good.withColumnRenamed("doc_key", "url"), seed
        ).withColumnRenamed("url", "doc_key")
    (
        routed.withColumn("shuffle_key", F.xxhash64("doc_key", "sent_idx", F.lit(seed)))
        .sortWithinPartitions("shuffle_key")
        .drop("shuffle_key")
        .write.mode("overwrite")
        .partitionBy("split")
        .json(out_path)
    )
    stats = {
        "n_sentences": good.count(),
        "n_docs_with_errors": errors.select("path").distinct().count(),
        "by_split_lang": [
            row.asDict()
            for row in routed.groupBy("split", "lang")
            .count()
            .orderBy("split", "lang")
            .collect()
        ],
    }
    ann.unpersist()
    return stats
