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


# --- Iceberg table sink (cluster path; parquet fallback in-sandbox) --------
def _iceberg_catalogs_from(conf_items) -> list[str]:
    """Catalog names among (key, value) conf pairs: a catalog is a
    ``spark.sql.catalog.<name>`` entry (no deeper nesting — those are
    catalog OPTIONS) whose value is an Iceberg catalog impl."""
    out = []
    for k, v in conf_items:
        if (
            k.startswith("spark.sql.catalog.")
            and k.count(".") == 3
            and "iceberg" in str(v).lower()
        ):
            out.append(k.rsplit(".", 1)[1])
    return out


def iceberg_catalogs(spark: SparkSession) -> list[str]:
    """Names of configured Iceberg catalogs (spark.sql.catalog.<name> =
    org.apache.iceberg.spark.SparkCatalog), read from the launch conf —
    catalogs must be configured before the session starts. Empty in
    this sandbox (no Iceberg runtime jar on the classpath)."""
    return _iceberg_catalogs_from(spark.sparkContext.getConf().getAll())


def materialize_iceberg(
    df: DataFrame,
    table: str,
    partition_by: list[str] | None = None,
    mode: str = "replace",
) -> None:
    """Materialize a stage as a partitioned Iceberg table — the
    production sink of the north rule ("nodes/edges as partitioned
    Iceberg tables"). `table` is a catalog-qualified name
    (``catalog.db.stage``); per-partition lineage then comes from
    Iceberg's own snapshot/manifest metadata instead of
    ``_lineage.json``.

    Raises RuntimeError with setup guidance when no Iceberg catalog is
    configured (this sandbox): the caller (run_pipeline's checkpointed
    path) uses the parquet + manifest fallback instead.
    """
    spark = df.sparkSession
    catalog = table.split(".", 1)[0]
    if catalog not in iceberg_catalogs(spark):
        raise RuntimeError(
            f"No Iceberg catalog {catalog!r} configured. Launch with "
            "--packages org.apache.iceberg:iceberg-spark-runtime-..., "
            f"--conf spark.sql.catalog.{catalog}="
            "org.apache.iceberg.spark.SparkCatalog and a warehouse conf; "
            "in this sandbox use lineage.materialize (parquet + manifest)."
        )
    writer = df.writeTo(table).using("iceberg")
    if partition_by:
        from pyspark.sql import functions as F

        writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
    if mode == "replace":
        writer.createOrReplace()
    elif mode == "append":
        writer.append()
    else:
        raise ValueError(f"unknown mode {mode!r}")


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
