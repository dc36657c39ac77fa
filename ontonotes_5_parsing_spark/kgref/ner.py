"""Mention detection: gazetteer NER → BIO tags → char spans.

Plays the role of `parse_named_entities_labeling`
(/root/reference/ontonotes5/utils.py:114-222, BIO emission at 214-221)
and the BIO→span run-length scan (utils.py:738-768, W1 in SURVEY.md
§2.5): the reference reads gold `name:` annotations from `.onf` Leaves
blocks; web pages have no gold annotations, so the engine's equivalent
tagger is deterministic longest-match gazetteer NER over the OntoNotes
18 types, emitting the same BIO alphabet (O | B-TYPE | I-TYPE) aligned
1:1 with tokens, then the same open-at-B / extend-at-I / close-at-O
span reconstruction.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

from .lexicon import GAZETTEER
from .spans import Span, check_bounds
from .tokenize import tokenize_any_text, tokenize_with_bounds

# gazetteer keyed by token tuple for longest-match scanning
_GAZ_TOKENS: Dict[Tuple[str, ...], str] = {}
_MAX_GAZ_LEN = 1
for _surface, _etype in GAZETTEER.items():
    _toks = tuple(tokenize_any_text(_surface))
    _GAZ_TOKENS[_toks] = _etype
    _MAX_GAZ_LEN = max(_MAX_GAZ_LEN, len(_toks))
# first tokens of any gazetteer entry: tokens outside this set can never
# start a match, so the longest-match tuple probing is skipped for them
_GAZ_FIRST = frozenset(t[0] for t in _GAZ_TOKENS)
# gazetteer re-indexed by first token, entries longest-first: probing
# compares only the (usually 1-2) real candidate entries instead of
# building a tuple per span length — same longest-match result because
# at most one entry exists per (first token, length)
_GAZ_BY_FIRST: Dict[str, List[Tuple[List[str], str, int]]] = {}
for _toks, _etype in _GAZ_TOKENS.items():
    _GAZ_BY_FIRST.setdefault(_toks[0], []).append((list(_toks), _etype, len(_toks)))
for _lst in _GAZ_BY_FIRST.values():
    _lst.sort(key=lambda x: -x[2])
_B_TAG = {e: "B-" + e for e in set(_GAZ_TOKENS.values()) | {"DATE", "CARDINAL"}}
_I_TAG = {e: "I-" + e for e in _B_TAG}

_YEAR = re.compile(r"^(1[89]\d\d|20\d\d)$")
_NUMBER = re.compile(r"^\d+$")
_SINGLE_TYPE_CACHE: Dict[str, str | None] = {}


def _single_token_type(tok: str) -> str | None:
    try:
        return _SINGLE_TYPE_CACHE[tok]
    except KeyError:
        pass
    if _YEAR.match(tok):
        t: str | None = "DATE"
    elif _NUMBER.match(tok):
        t = "CARDINAL"
    else:
        t = None
    if len(_SINGLE_TYPE_CACHE) > 200_000:  # bound long-lived worker memory
        _SINGLE_TYPE_CACHE.clear()
    _SINGLE_TYPE_CACHE[tok] = t
    return t


def tag_bio(tokens: List[str]) -> List[str]:
    """Emit one BIO tag per token via longest-match gazetteer scan."""
    bio = ["O"] * len(tokens)
    i = 0
    n = len(tokens)
    while i < n:
        matched = False
        entries = _GAZ_BY_FIRST.get(tokens[i])
        if entries is not None:
            for ent_toks, etype, span_len in entries:
                if span_len == 1 or (
                    i + span_len <= n and tokens[i : i + span_len] == ent_toks
                ):
                    bio[i] = _B_TAG[etype]
                    itag = _I_TAG[etype]
                    for k in range(i + 1, i + span_len):
                        bio[k] = itag
                    i += span_len
                    matched = True
                    break
        if not matched:
            rule_type = _single_token_type(tokens[i])
            if rule_type is not None:
                bio[i] = _B_TAG[rule_type]
            i += 1
    return bio


def bio_to_spans(
    bio: List[str], token_bounds: List[Span]
) -> List[Tuple[int, int, str]]:
    """Run-length scan: open span at B-, extend on same-type I-, close at
    O / next B- / end of sentence (W1 semantics, utils.py:738-768).

    Returns (start, end, ent_type) char spans.
    """
    spans: List[Tuple[int, int, str]] = []
    cur_type: str | None = None
    cur_start = cur_end = 0
    # the BIO alphabet is exactly O | B-TYPE | I-TYPE, so a first-char
    # compare is equivalent to startswith and ~2× cheaper in the scan
    for tag, (ts, te) in zip(bio, token_bounds):
        head = tag[0]
        if head == "B":
            if cur_type is not None:
                spans.append((cur_start, cur_end, cur_type))
            cur_type = tag[2:]
            cur_start, cur_end = ts, te
        elif head == "I" and cur_type == tag[2:]:
            cur_end = te
        else:
            if cur_type is not None:
                spans.append((cur_start, cur_end, cur_type))
                cur_type = None
    if cur_type is not None:
        spans.append((cur_start, cur_end, cur_type))
    return spans


def annotate_sentence(text: str) -> dict:
    """Full per-sentence annotation record (reference JSON record shape,
    /root/reference/ontonotes5/utils.py:732-737): text + entities map
    {type: [(start, end), ...]} with spans sorted / validated.
    """
    tokens, bounds = tokenize_with_bounds(text)
    if not tokens:
        return {"text": text, "tokens": [], "bounds": [], "bio": [], "entities": {}}
    bio = tag_bio(tokens)
    entities: Dict[str, List[Span]] = {}
    for start, end, etype in bio_to_spans(bio, bounds):
        entities.setdefault(etype, []).append((start, end))
    for etype, span_list in entities.items():
        span_list.sort()
        err = check_bounds(text, span_list)
        if err:
            raise ValueError(f"{etype}: {err}")
    return {
        "text": text,
        "tokens": tokens,
        "bounds": bounds,
        "bio": bio,
        "entities": entities,
    }
