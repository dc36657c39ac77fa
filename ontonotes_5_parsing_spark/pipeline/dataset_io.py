"""JSON dataset sink/source (S4/S5 in SURVEY.md §2.1) with the
reference's structural validation re-expressed as Spark predicates.

The reference dumps one JSON file with TRAINING/VALIDATION/TESTING
record lists after a seeded shuffle (/root/reference/
ontonotes5_to_json.py:128-142) and re-validates structurally on load
(`load_ontonotes5_from_json`, utils.py:1106-1257). Here:

- the split becomes a partition column routed by a broadcast-joined
  ratio table (J1), not a dict-of-lists;
- the seeded shuffle becomes a keyed-hash sort (`xxhash64(url,
  sent_idx, seed)`) — deterministic under any partitioning, unlike
  `orderBy(rand(seed))` (SURVEY.md §7 hard part 6);
- load-time checks become a validity predicate + `observe` counters
  (invalid rows are counted and filtered, not raised — §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..functions.spans import check_bounds_sql
from .schemas import ANNOTATIONS_SCHEMA

SPLITS = [("train", 0, 7), ("validation", 7, 9), ("test", 9, 10)]


def route_splits(annotations: DataFrame, seed: int = 42) -> DataFrame:
    """Assign train/validation/test by keyed hash bucket (deterministic
    per record; disjoint and exhaustive by construction — the
    disjointness the reference asserts at ontonotes5_to_json.py:77-79)."""
    bucket = F.pmod(F.xxhash64("url", "sent_idx", F.lit(seed)), F.lit(10))
    split = F.when(bucket < SPLITS[0][2], SPLITS[0][0])
    split = split.when(bucket < SPLITS[1][2], SPLITS[1][0]).otherwise(SPLITS[2][0])
    return annotations.withColumn("split", split)


def write_json_dataset(
    annotations: DataFrame, path: str, seed: int = 42
) -> None:
    """Seeded-shuffle + partitioned JSON sink (S5).

    The within-split order is pinned by the keyed hash so output is
    byte-stable for a given (input, seed) at any parallelism.
    """
    routed = route_splits(annotations, seed)
    (
        routed.withColumn("shuffle_key", F.xxhash64("url", "sent_idx", F.lit(seed)))
        .sortWithinPartitions("shuffle_key")
        .drop("shuffle_key")
        .write.mode("overwrite")
        .partitionBy("split")
        .json(path)
    )


def read_json_dataset(
    spark: SparkSession, path: str
) -> tuple[DataFrame, Observation]:
    """Schema-pinned JSON source (S4) + structural validation.

    Returns (valid rows, observation). The observation exposes
    `n_rows` / `n_invalid` after the first action — the Spark shape of
    the reference's raise-on-invalid loader (utils.py:1106-1257).
    Validity = text non-empty, every entity label non-blank, and every
    span list sorted/non-overlapping/in-bounds/stripped (check_bounds,
    utils.py:454-486).
    """
    # StructType.add mutates in place — build from a field copy so the
    # shared ANNOTATIONS_SCHEMA stays 5 fields wide
    from pyspark.sql import types as T

    schema = T.StructType(
        list(ANNOTATIONS_SCHEMA.fields) + [T.StructField("split", T.StringType(), True)]
    )
    raw = spark.read.schema(schema).json(path)
    label_ok = F.expr(
        "aggregate(map_keys(entities), true, (acc, k) -> acc and length(trim(k)) > 0)"
    )
    # per-label span-list validity (the reference checks each class's
    # lists independently, utils.py:1163-1241 — overlaps across labels
    # are legal, overlaps within one label's list are not)
    spans_ok = F.expr(
        "aggregate(map_values(entities), true, (acc, sp) -> acc and ("
        + check_bounds_sql("text", "sp")
        + "))"
    )
    valid = (
        (F.length(F.trim("text")) > 0)
        & F.col("entities").isNotNull()
        & label_ok
        & spans_ok
    )
    obs = Observation("dataset_validation")
    observed = raw.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(~valid, 1).otherwise(0)).alias("n_invalid"),
    )
    return observed.filter(valid), obs
