"""Per-stage lineage manifests + checkpoint-resume (BASELINE.json:14).

Every materialized stage writes parquet plus a `_lineage.json` manifest
(stage name, row count, schema, per-file row counts, wall time). Resume
is relational: the still-to-do inputs are
``input.join(done_urls, "url", "left_anti")`` — the Spark mapping of the
reference's files_with_errors bookkeeping
(/root/reference/ontonotes5_to_json.py:80,106-107,145-151) generalized
to restartable stages.

Iceberg note: on a cluster these writes become
``df.writeTo("catalog.db.<stage>").append()`` with identical schemas;
the sandbox has no Iceberg runtime jar, so the format-agnostic
`materialize` falls back to partitioned parquet (SURVEY.md §7 M0).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_lineage.json"


def manifest_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, MANIFEST_NAME)


def is_complete(stage_dir: str) -> bool:
    return os.path.exists(manifest_path(stage_dir))


def materialize(
    df: DataFrame,
    stage_dir: str,
    stage_name: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Write a stage output + lineage manifest; return the re-read frame.

    Re-reading from parquet pins the stage boundary: downstream plans
    start from a fresh scan (column pruning / predicate pushdown apply)
    instead of dragging the full upstream lineage along.
    """
    spark = df.sparkSession
    t0 = time.time()
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(stage_dir)
    out = spark.read.parquet(stage_dir)
    per_file = {
        r["file"]: r["rows"]
        for r in out.groupBy(F.input_file_name().alias("file"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .collect()
    }
    manifest = {
        "stage": stage_name,
        "rows": int(sum(per_file.values())),
        "n_files": len(per_file),
        "per_file_rows": per_file,
        "schema": out.schema.jsonValue(),
        "partition_by": partition_by or [],
        "wall_sec": round(time.time() - t0, 3),
        "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(manifest_path(stage_dir), "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    return out


def load_stage(spark: SparkSession, stage_dir: str) -> DataFrame:
    return spark.read.parquet(stage_dir)


def resume_filter(input_df: DataFrame, done_dir: str, key: str = "url") -> DataFrame:
    """Rows of `input_df` not yet present in a completed stage output —
    the anti-join resume primitive (SURVEY.md §2.3)."""
    if not is_complete(done_dir):
        return input_df
    done_keys = input_df.sparkSession.read.parquet(done_dir).select(key).distinct()
    return input_df.join(done_keys, key, "left_anti")


def read_manifest(stage_dir: str) -> dict:
    with open(manifest_path(stage_dir)) as fh:
        return json.load(fh)
