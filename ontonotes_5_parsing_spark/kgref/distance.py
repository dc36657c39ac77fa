"""Hierarchical label distance (reference parity: F13, J2; SURVEY.md §2.8).

Fresh implementation matching `calculate_distance`
(/root/reference/ontonotes5/utils.py:1047-1103) and `find_similary_item`
(/root/reference/reduce_entities.py:12-20). Used by the engine both for
label-vocabulary reduction and as the pair scorer in entity linking.
"""

from __future__ import annotations

import re
from typing import List, Sequence

from .align import levenshtein

_ALPHA = re.compile(r"\w+")
_SPLITTER = re.compile(r"[.+:\-=]")


def label_distance(label1: str, label2: str) -> int:
    """Distance between two annotation labels / entity surface keys.

    Semantics (matching the reference): 0 if equal after strip; a ×10
    length penalty when exactly one side contains word characters;
    otherwise split both on ``[.+:-=]``, join the non-empty stripped
    parts with '-', then: equal → 1, one a prefix of the other → 2,
    shared leading parts → Levenshtein of the remainders + 2, no shared
    prefix → 10×Levenshtein + 2. Empty part lists short-circuit.
    """
    if label1.strip() == label2.strip():
        return 0
    has_alpha1 = _ALPHA.search(label1) is not None
    has_alpha2 = _ALPHA.search(label2) is not None
    if has_alpha1 != has_alpha2:
        return (len(label1) + len(label2)) * 10
    parts1 = [p for p in (q.strip() for q in _SPLITTER.split(label1)) if p]
    parts2 = [p for p in (q.strip() for q in _SPLITTER.split(label2)) if p]
    if not parts1 and not parts2:
        return 0
    if not parts1:
        return len("-".join(parts2)) + 2
    if not parts2:
        return len("-".join(parts1)) + 2
    s1 = "-".join(parts1)
    s2 = "-".join(parts2)
    if s1 == s2:
        return 1
    if s1.startswith(s2) or s2.startswith(s1):
        return 2
    shared = 0
    for p1, p2 in zip(parts1, parts2):
        if p1 != p2:
            break
        shared += 1
    if shared > 0:
        rest1 = "-".join(parts1[shared:])
        rest2 = "-".join(parts2[shared:])
        return levenshtein(rest1, rest2) + 2
    return levenshtein(s1, s2) * 10 + 2


def find_nearest_label(label: str, candidates: Sequence[str]) -> int:
    """Index of the nearest candidate (first wins on ties) — parity with
    `find_similary_item` (reduce_entities.py:12-20)."""
    best_idx = 0
    best = label_distance(candidates[0], label)
    for idx, cand in enumerate(candidates[1:], 1):
        d = label_distance(cand, label)
        if d < best:
            best = d
            best_idx = idx
    return best_idx
