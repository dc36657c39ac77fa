"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: full KG-construction DAG (extract → parse →
                 mentions → triples → link → canonicalize) over pages
                 derived deterministically from sf0.001/documents.parquet,
                 returning the named top edges of the graph.
queries()      — one entry per implemented operator (SURVEY.md §2 plus
                 the training-data-pipeline families: dedup, similarity,
                 text analysis, events).
oracle_sql()   — DuckDB-equivalent SQL for EVERY query (round 5: even
                 kg_triples, the Arrow-UDF parse, is hash-checked — the
                 oracle re-derives the triples relationally from a
                 materialized per-sentence item table; other non-SQL ops
                 are oracle-checked via parquet materialization, SQL
                 blob decoding, or a recursive-CTE closure — see
                 operators/*.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ontonotes_5_parsing_spark.operators.registry import GRADED_QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from ontonotes_5_parsing_spark.operators.kg import q_kg_edges_top

    return q_kg_edges_top(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver-graded window: exactly 50 queries, most-critical first
    (the driver grades the first 50 entries in insertion order; see
    operators/registry.py GRADED_ORDER). The full implemented surface
    is registry.ALL_QUERIES, checked by tests + tools/check_oracle.py
    --all."""
    return {name: fn for name, (fn, _sql) in GRADED_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted for non-SQL-expressible ops)."""
    return {name: sql for name, (_fn, sql) in GRADED_QUERIES.items() if sql is not None}
