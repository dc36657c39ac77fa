"""Spark span-algebra Column functions vs the kgref Python kernels —
elementwise agreement on shared vectors (SURVEY.md §2.8 F8-F12)."""

import pytest
from pyspark.sql import functions as F

from ontonotes_5_parsing_spark.functions import (
    check_bounds_col,
    insert_new_bounds_col,
    merge_bounds_col,
    span_array,
    strip_bounds_col,
    unite_overlapped_bounds_col,
)
from ontonotes_5_parsing_spark.kgref import (
    check_bounds,
    insert_new_bounds,
    merge_bounds,
    strip_bounds,
    unite_overlapped_bounds,
)

MERGE_VECTORS = [
    [(0, 3), (2, 5), (5, 8)],
    [(0, 3), (3, 6)],
    [(0, 10), (1, 2), (10, 12)],
    [],
]

UNITE_VECTORS = [
    [(0, 3), (2, 5), (7, 9)],
    [(0, 3), (3, 6)],
    [(1, 4)],
    [],
]

STRIP_VECTORS = [
    (" ab  cd ", [(0, 4), (4, 8)]),
    ("hello world", [(0, 6), (6, 11)]),
]

INSERT_VECTORS = [
    ((4, 7), [(0, 2), (8, 10)]),
    ((1, 9), [(0, 2), (8, 10)]),
    ((2, 4), [(0, 2)]),
    ((0, 1), []),
]

CHECK_VECTORS = [
    ("hello world", [(0, 5), (6, 11)]),
    ("hello world", [(0, 5), (4, 8)]),
    ("hi", [(0, 5)]),
    ("a   b", [(1, 3)]),
    ("a b", [(0, 2)]),
]


def _spans_of(rows):
    return [(s["start"], s["end"]) for s in rows]


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


@pytest.mark.parametrize("vec", MERGE_VECTORS)
def test_merge_bounds_col(spark, vec):
    df = spark.range(1).select(span_array(*vec).alias("spans"))
    got = _spans_of(df.select(merge_bounds_col("spans").alias("v")).collect()[0]["v"])
    assert got == merge_bounds(vec)


@pytest.mark.parametrize("vec", UNITE_VECTORS)
def test_unite_overlapped_bounds_col(spark, vec):
    df = spark.range(1).select(span_array(*vec).alias("spans"))
    got = _spans_of(
        df.select(unite_overlapped_bounds_col("spans").alias("v")).collect()[0]["v"]
    )
    assert got == unite_overlapped_bounds(vec)


@pytest.mark.parametrize("text,vec", STRIP_VECTORS)
def test_strip_bounds_col(spark, text, vec):
    df = spark.createDataFrame([(text,)], ["text"]).select(
        "text", span_array(*vec).alias("spans")
    )
    got = _spans_of(
        df.select(strip_bounds_col("text", "spans").alias("v")).collect()[0]["v"]
    )
    assert got == strip_bounds(text, vec)


@pytest.mark.parametrize("new,old", INSERT_VECTORS)
def test_insert_new_bounds_col(spark, new, old):
    df = spark.range(1).select(span_array(*old).alias("spans"))
    got = _spans_of(
        df.select(
            insert_new_bounds_col(new[0], new[1], "spans").alias("v")
        ).collect()[0]["v"]
    )
    assert got == insert_new_bounds(new, old)


@pytest.mark.parametrize("text,vec", CHECK_VECTORS)
def test_check_bounds_col(spark, text, vec):
    df = spark.createDataFrame([(text,)], ["text"]).select(
        "text", span_array(*vec).alias("spans")
    )
    got = df.select(check_bounds_col("text", "spans").alias("v")).collect()[0]["v"]
    assert got == (check_bounds(text, vec) == "")
