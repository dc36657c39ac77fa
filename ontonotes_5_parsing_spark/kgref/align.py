"""Token↔text alignment kernels (reference parity: F6, F7; SURVEY.md §2.8).

The reference's heaviest kernels, re-implemented fresh:

- `levenshtein` replaces the `python-Levenshtein` C extension
  (requirements.txt:3) with a numpy-free iterative DP.
- `find_subword_bounds` matches `find_subword_bounds`
  (/root/reference/ontonotes5/utils.py:242-284) — the reference uses
  exhaustive recursion over split points (exponential worst-case); this
  is the memoized O(m·n²) equivalent with identical results including
  tie-breaking (the reference keeps the *first* split position achieving
  the minimum at each level, i.e. smallest end position on ties —
  preserved here by strict-improvement comparison over ascending ends).
- `get_token_bounds_fuzzy` matches `get_token_bounds_fuzzy`
  (utils.py:287-404): global alignment of the source-token sequence vs a
  treebank-style token sequence with normalized-Levenshtein substitution
  cost and asymmetric insertion/deletion costs, numpy DP + backtrace,
  then per-group subword refinement.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence, Tuple

import numpy as np

from .spans import Span, get_token_bounds
from .tokenize import tokenize_any_text


def levenshtein(a: str, b: str) -> int:
    """Classic edit distance (insert/delete/substitute, unit costs)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def find_subword_bounds(
    word: str, subwords: Sequence[str]
) -> Tuple[List[Span], int]:
    """Best contiguous split of `word` into ``len(subwords)`` non-empty
    pieces minimizing the total Levenshtein distance piece↔subword.

    Same contract as the reference (utils.py:242-284): raises ValueError
    when the word is shorter than the subword count; returns
    (bounds, total_distance). Memoized recursion instead of the
    reference's exponential re-exploration; identical outputs.
    """
    if len(word) < len(subwords):
        raise ValueError(
            f"Word {word} does not correspond to sub-words {list(subwords)}."
        )
    subwords = tuple(subwords)
    if len(word) == len(subwords):
        bounds = [(i, i + 1) for i in range(len(word))]
        dist = sum(levenshtein(word[s:e], sw) for (s, e), sw in zip(bounds, subwords))
        return bounds, dist

    @lru_cache(maxsize=None)
    def best(char_pos: int, sub_idx: int) -> Tuple[int, Tuple[int, ...]]:
        remaining_subs = len(subwords) - sub_idx
        if remaining_subs == 1:
            return levenshtein(word[char_pos:], subwords[sub_idx]), (len(word),)
        remaining_chars = len(word) - char_pos
        if remaining_chars == remaining_subs:
            dist = sum(
                levenshtein(word[char_pos + k], subwords[sub_idx + k])
                for k in range(remaining_subs)
            )
            return dist, tuple(range(char_pos + 1, len(word) + 1))
        best_dist = None
        best_cuts: Tuple[int, ...] = ()
        # ascending end positions; strict < keeps the earliest minimum,
        # matching the reference's first-match tie-break (utils.py:279-282)
        for end in range(char_pos + 1, len(word) - remaining_subs + 2):
            head = levenshtein(word[char_pos:end], subwords[sub_idx])
            tail_dist, tail_cuts = best(end, sub_idx + 1)
            total = head + tail_dist
            if best_dist is None or total < best_dist:
                best_dist = total
                best_cuts = (end,) + tail_cuts
        return best_dist, best_cuts  # type: ignore[return-value]

    dist, cuts = best(0, 0)
    bounds = []
    start = 0
    for end in cuts:
        bounds.append((start, end))
        start = end
    return bounds, dist


def _normalized_cost(a: str, b: str) -> float:
    if a == b:
        return 0.0
    return float(levenshtein(a, b)) / float(max(len(a), len(b)))


def get_token_bounds_fuzzy(
    source_text: str,
    tokens: Sequence[str],
    insertion_cost: float = 3.0,
    deletion_cost: float = 1.0,
) -> List[Span]:
    """Align a treebank-style token sequence to raw text char offsets.

    Parity with the reference (utils.py:287-404): tokenize the source
    text; when the counts match, fall through to exact alignment of the
    *source* tokens; otherwise run the asymmetric-cost DP over the two
    token sequences, group aligned runs, and refine many-to-one groups
    with `find_subword_bounds`.
    """
    if not source_text.strip():
        return []
    source_tokens = [t for t in (tok.strip() for tok in tokenize_any_text(source_text)) if t]
    token_bounds = get_token_bounds(source_text, source_tokens)
    n_s, n_t = len(source_tokens), len(tokens)
    if n_s == n_t:
        return token_bounds

    # --- DP matrix (numpy, float32 — matches reference utils.py:315-337)
    dmat = np.zeros((n_s + 1, n_t + 1), dtype=np.float32)
    dmat[0, 1:] = np.cumsum(np.full(n_t, insertion_cost, dtype=np.float32))
    dmat[1:, 0] = np.cumsum(np.full(n_s, deletion_cost, dtype=np.float32))
    for i in range(1, n_s + 1):
        for j in range(1, n_t + 1):
            sub = _normalized_cost(source_tokens[i - 1], tokens[j - 1])
            dmat[i, j] = min(
                dmat[i - 1, j] + deletion_cost,
                dmat[i, j - 1] + insertion_cost,
                dmat[i - 1, j - 1] + sub,
            )

    # --- backtrace (same preference order as utils.py:338-365)
    i, j = n_s, n_t
    path = [(i - 1, j - 1)]
    while i > 1 and j > 1:
        if dmat[i - 1, j - 1] < dmat[i - 1, j]:
            if dmat[i - 1, j - 1] < dmat[i, j - 1]:
                i -= 1
                j -= 1
            else:
                j -= 1
        else:
            if dmat[i - 1, j] < dmat[i, j - 1]:
                i -= 1
            else:
                j -= 1
        path.insert(0, (i - 1, j - 1))
    while i > 1:
        i -= 1
        path.insert(0, (i - 1, j - 1))
    while j > 1:
        j -= 1
        path.insert(0, (i - 1, j - 1))

    # --- group runs where one side repeats (utils.py:367-386)
    groups: List[Tuple[List[int], List[int]]] = [([path[0][0]], [path[0][1]])]
    for si, ti in path[1:]:
        src_run, tok_run = groups[-1]
        if si > src_run[-1]:
            if ti > tok_run[-1]:
                groups.append(([si], [ti]))
            else:
                src_run.append(si)
        elif ti > tok_run[-1]:
            tok_run.append(ti)

    # --- emit bounds; many-tokens-to-one-source-run → subword refinement
    bounds: List[Span] = []
    for src_run, tok_run in groups:
        span_start = token_bounds[src_run[0]][0]
        span_end = token_bounds[src_run[-1]][1]
        if len(tok_run) > 1:
            sub_bounds, _ = find_subword_bounds(
                source_text[span_start:span_end],
                [tokens[k] for k in range(tok_run[0], tok_run[-1] + 1)],
            )
            bounds.extend((s + span_start, e + span_start) for s, e in sub_bounds)
        else:
            bounds.append((span_start, span_end))
    return bounds
