"""functions — the reference's span algebra as Spark column functions.

Each function is a higher-order-array Column expression with the exact
semantics of its kgref / reference counterpart (SURVEY.md §2.8 F8-F12),
so span manipulation can run JVM-side on `array<struct<start,end>>`
columns without a UDF.
"""

from .spans import (
    merge_bounds_col,
    strip_bounds_col,
    unite_overlapped_bounds_col,
    insert_new_bounds_col,
    check_bounds_col,
    span_array,
)

__all__ = [
    "merge_bounds_col",
    "strip_bounds_col",
    "unite_overlapped_bounds_col",
    "insert_new_bounds_col",
    "check_bounds_col",
    "span_array",
]
