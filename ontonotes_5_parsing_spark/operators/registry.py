"""Aggregated query registry: name → (spark_fn, oracle_sql | None)."""

from __future__ import annotations

from . import dedup, eventsops, kg, multimodal, quality, relational, similarity, text

ALL_QUERIES: dict = {}
for module in (relational, text, quality, dedup, similarity, eventsops, kg, multimodal):
    for name, pair in module.QUERIES.items():
        assert name not in ALL_QUERIES, f"duplicate query name {name}"
        ALL_QUERIES[name] = pair
