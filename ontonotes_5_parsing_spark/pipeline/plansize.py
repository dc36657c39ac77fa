"""Catalyst plan-size probe shared by the small-regime fast paths.

Both the static-plan scope (run.py) and the link stage's driver-side
connected-components hint (linking.py) gate on the same question — "is
this input provably small?" — answered from the optimizer's sizeInBytes
estimate, conservatively huge when stats are unavailable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

STATIC_PLAN_MAX_BYTES = 512 << 20  # 512 MiB optimizer estimate


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for a plan (bytes); conservative
    (very large) when stats are unavailable."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # noqa: BLE001 — any py4j hiccup → assume big
        return 1 << 62


def is_small_plan(df: DataFrame, max_bytes: int = STATIC_PLAN_MAX_BYTES) -> bool:
    return plan_size_bytes(df) <= max_bytes
