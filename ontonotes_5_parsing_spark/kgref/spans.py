"""Character-span algebra (reference parity: F5, F8–F12 in SURVEY.md §2.8).

Spans are half-open ``(start, end)`` int tuples over a sentence's plain
text — the universal value type of the reference
(/root/reference/ontonotes5/utils.py:225-239 and 407-486). Each function
below is a fresh implementation matching the behavior of the cited
reference function, including its error conditions and quirks.
"""

from __future__ import annotations

from typing import List, Tuple

Span = Tuple[int, int]


def get_token_bounds(text: str, tokens: List[str]) -> List[Span]:
    """Exact left-to-right alignment of tokens to character offsets.

    Parity with `get_token_bounds` (utils.py:225-239): scan with a
    moving offset via ``str.find``; a miss is a hard error.
    """
    bounds: List[Span] = []
    pos = 0
    for tok in tokens:
        found = text.find(tok, pos)
        if found < 0:
            raise ValueError(
                f"Token {tok!r} cannot be found in text {text!r} from position {pos}!"
            )
        bounds.append((found, found + len(tok)))
        pos = found + len(tok)
    return bounds


def merge_bounds(source: List[Span]) -> List[Span]:
    """Keep spans whose start is >= the previous kept span's end.

    Parity with `megre_bounds` [sic] (utils.py:407-418): drops nested /
    overlapping spans, keeping the earliest.
    """
    kept: List[Span] = []
    for span in source:
        if not kept or span[0] >= kept[-1][1]:
            kept.append(span)
    return kept


def strip_bounds(text: str, bounds: List[Span]) -> List[Span]:
    """Shrink each span so ``text[start:end]`` carries no edge whitespace.

    Parity with `strip_bounds` (utils.py:421-431).
    """
    out: List[Span] = []
    for start, end in bounds:
        piece = text[start:end]
        stripped = piece.strip()
        lead = piece.find(stripped)
        out.append((start + lead, start + lead + len(stripped)))
    return out


def unite_overlapped_bounds(bounds: List[Span]) -> List[Span]:
    """Merge touching/overlapping spans of a sorted span list.

    Parity with `unite_overlapped_bounds` (utils.py:434-451), including
    its two quirks: an element starting before the current union's start
    raises ValueError, and an overlapping element's end *replaces* the
    union end (it does not take the max).
    """
    if not bounds:
        return []
    united: List[Span] = [bounds[0]]
    for start, end in bounds[1:]:
        if start > united[-1][1]:
            united.append((start, end))
        else:
            if start < united[-1][0]:
                raise ValueError(
                    f"Item {(start, end)} in bounds list {bounds} is wrong!"
                )
            united[-1] = (united[-1][0], end)
    return united


def insert_new_bounds(new_bounds: Span, old_bounds_list: List[Span]) -> List[Span]:
    """Insert a span into a disjoint sorted span list, uniting overlaps.

    Parity with `insert_new_bounds` (utils.py:1002-1044) which marks an
    occupancy bitmap and re-extracts maximal runs — O(text length). This
    implementation is the O(k log k) sort-merge equivalent: intervals
    that touch (``start == end`` of the previous) fuse, exactly as
    adjacent bitmap cells do. The same validation of the old list is
    applied first (sorted, non-overlapping, non-empty spans).
    """
    if not old_bounds_list:
        return [new_bounds]
    ordered = sorted(old_bounds_list)
    prev_end = -1
    for start, end in ordered:
        if start >= end or start <= prev_end:
            raise ValueError(
                f"Item {(start, end)} of bounds list {ordered} is wrong!"
            )
        prev_end = end
    merged: List[Span] = []
    for start, end in sorted(ordered + [new_bounds]):
        if merged and start <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], end))
        else:
            merged.append((start, end))
    return merged


def check_bounds(text: str, bounds: List[Span]) -> str:
    """Validate a span list; return '' if OK else an error message.

    Parity with `check_bounds` (utils.py:454-486): checks each span (in
    (start, end) sorted order) is non-empty, non-overlapping with the
    previous, in-bounds, and that its text is non-blank and stripped.
    """
    prev_end = 0
    for start, end in sorted(bounds):
        err = f"Item {(start, end)} in the bounds list {bounds} is wrong!"
        if start >= end:
            return err + f" start_pos={start} >= end_pos={end}"
        if start < prev_end:
            return err + f" start_pos={start} < prev_pos={prev_end}"
        if end > len(text):
            return err + f" end_pos={end} > len(text)={len(text)}"
        piece = text[start:end]
        if not piece.strip():
            return err + f" text[{start}:{end}] is empty!"
        if piece != piece.strip():
            return err + f" text[{start}:{end}] != text[{start}:{end}].strip()"
        prev_end = end
    return ""
