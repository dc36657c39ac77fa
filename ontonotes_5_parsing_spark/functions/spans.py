"""Span algebra as Spark Column expressions (SURVEY.md §2.8 F8-F12).

Spans are `struct<start:bigint, end:bigint>` elements of array columns.
Every function mirrors a kgref kernel (same names), which in turn
mirrors the cited reference function — the pytest suite asserts
elementwise agreement between the Column expression and the Python
kernel on shared vectors.

All expressions are pure higher-order array functions (`aggregate`,
`transform`, `filter`, `array_sort`) — no UDFs, no shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SPAN_ARR = "array<struct<start:bigint,end:bigint>>"


def span_array(*pairs: tuple[int, int]) -> Column:
    """Literal span-array column (test/builder helper)."""
    if not pairs:
        return F.expr(f"cast(array() as {_SPAN_ARR})")
    items = ", ".join(
        f"named_struct('start', cast({s} as bigint), 'end', cast({e} as bigint))"
        for s, e in pairs
    )
    return F.expr(f"array({items})")


def merge_bounds_col(spans: str) -> Column:
    """Keep spans whose start >= previous kept end (kgref.merge_bounds;
    reference `megre_bounds` utils.py:407-418)."""
    return F.expr(
        f"""
        aggregate(
          {spans},
          cast(array() as {_SPAN_ARR}),
          (acc, s) -> if(size(acc) = 0 or s.start >= element_at(acc, -1).end,
                         array_append(acc, s), acc)
        )
        """
    )


def strip_bounds_col(text: str, spans: str) -> Column:
    """Shrink each span so its text carries no edge whitespace
    (kgref.strip_bounds; reference utils.py:421-431).

    ltrim/rtrim length arithmetic instead of python str.find."""
    return F.expr(
        f"""
        transform(
          {spans},
          s -> named_struct(
            'start', s.start + (length(substring({text}, cast(s.start + 1 as int),
                                                 cast(s.end - s.start as int)))
                     - length(ltrim(substring({text}, cast(s.start + 1 as int),
                                              cast(s.end - s.start as int))))),
            'end', s.end - (length(substring({text}, cast(s.start + 1 as int),
                                             cast(s.end - s.start as int)))
                   - length(rtrim(substring({text}, cast(s.start + 1 as int),
                                            cast(s.end - s.start as int)))))
          )
        )
        """
    )


def unite_overlapped_bounds_col(spans: str) -> Column:
    """Merge touching/overlapping spans of a sorted list, replicating the
    reference's end-replacement quirk (utils.py:434-451: an overlapping
    element's end replaces the union end — no max taken). Out-of-order
    input is the caller's contract (validated by check_bounds_col)."""
    return F.expr(
        f"""
        aggregate(
          {spans},
          cast(array() as {_SPAN_ARR}),
          (acc, s) -> case
            when size(acc) = 0 then array(s)
            when s.start > element_at(acc, -1).end then array_append(acc, s)
            else array_append(slice(acc, 1, size(acc) - 1),
                              named_struct('start', element_at(acc, -1).start,
                                           'end', s.end))
          end
        )
        """
    )


def insert_new_bounds_col(new_start: int, new_end: int, spans: str) -> Column:
    """Insert a span into a disjoint sorted list, uniting overlaps and
    touches (kgref.insert_new_bounds; reference bitmap union
    utils.py:1002-1044 re-expressed as sort-merge)."""
    ns = f"cast({new_start} as bigint)"
    ne = f"cast({new_end} as bigint)"
    return F.expr(
        f"""
        aggregate(
          array_sort(array_append({spans}, named_struct('start', {ns}, 'end', {ne}))),
          cast(array() as {_SPAN_ARR}),
          (acc, s) -> case
            when size(acc) = 0 then array(s)
            when s.start <= element_at(acc, -1).end
              then array_append(slice(acc, 1, size(acc) - 1),
                     named_struct('start', element_at(acc, -1).start,
                                  'end', greatest(element_at(acc, -1).end, s.end)))
            else array_append(acc, s)
          end
        )
        """
    )


def check_bounds_sql(text: str, spans: str) -> str:
    """SQL fragment form of check_bounds_col — composable inside outer
    higher-order lambdas (lambda variable names are chosen to avoid
    capture collisions when nested)."""
    return f"""
        aggregate(
          array_sort({spans}),
          named_struct('ok', true, 'prev', cast(0 as bigint)),
          (cacc, cs) -> named_struct(
            'ok', cacc.ok
                  and cs.start < cs.end
                  and cs.start >= cacc.prev
                  and cs.end <= length({text})
                  and length(trim(substring({text}, cast(cs.start + 1 as int),
                                            cast(cs.end - cs.start as int)))) > 0
                  and substring({text}, cast(cs.start + 1 as int),
                                cast(cs.end - cs.start as int))
                      = trim(substring({text}, cast(cs.start + 1 as int),
                                       cast(cs.end - cs.start as int))),
            'prev', cs.end),
          cacc -> cacc.ok
        )
        """


def check_bounds_col(text: str, spans: str) -> Column:
    """Span-list validity predicate (kgref.check_bounds semantics,
    reference utils.py:454-486): sorted input's spans must be non-empty,
    non-overlapping, in-bounds, with stripped non-blank text. Returns a
    boolean Column (the engine filters + counts invalid rows via
    `observe` instead of raising, SURVEY.md §1.3)."""
    return F.expr(check_bounds_sql(text, spans))
