"""Dependency-pattern (subj, pred, obj) triple extraction.

The sequential oracle for the engine's triple stage (BASELINE.json:6).
Pattern: within one sentence, order mentions and predicate-verb tokens
by position; every consecutive (MENTION, PREDICATE, MENTION) run in
that item sequence yields one (subj, pred, obj) triple. The Spark
pipeline reproduces this with window functions (lead over an item
sequence partitioned by sentence) — this function is the per-sentence
ground truth both are compared against (P/R ≥ 0.95, BASELINE.json:2).
"""

from __future__ import annotations

from typing import List, Tuple

from .lexicon import PREDICATE_VERBS
from .ner import annotate_sentence, bio_to_spans

PREDICATES = frozenset(PREDICATE_VERBS)

Triple = Tuple[str, str, str]


def extract_triples(sentence_text: str) -> List[dict]:
    """All (subj, pred, obj) triples of one sentence, with char spans."""
    ann = annotate_sentence(sentence_text)
    return triples_from_annotation(
        sentence_text, ann["tokens"], ann["bounds"], ann["bio"]
    )


def triples_from_annotation(
    sentence_text: str, tokens, bounds, bio, mention_spans=None
) -> List[dict]:
    """Triple scan over an already-annotated sentence (shared by
    `extract_triples` and the Spark parse stage, which holds the
    annotation arrays in hand). ``mention_spans`` may be passed when
    the caller already ran `bio_to_spans`."""
    if mention_spans is None:
        mention_spans = bio_to_spans(bio, bounds)

    # item sequence: mentions and predicate tokens ordered by start offset
    items: List[tuple] = []  # (start, end, kind, payload)
    for start, end, etype in mention_spans:
        items.append((start, end, "M", (sentence_text[start:end], etype)))
    mention_token_idx = {
        i for i, tag in enumerate(bio) if tag != "O"
    }
    for i, tok in enumerate(tokens):
        if i not in mention_token_idx and tok in PREDICATES:
            s, e = bounds[i]
            items.append((s, e, "P", tok))
    items.sort()

    triples: List[dict] = []
    for k in range(len(items) - 2):
        a, b, c = items[k], items[k + 1], items[k + 2]
        if a[2] == "M" and b[2] == "P" and c[2] == "M":
            triples.append(
                {
                    "subj": a[3][0],
                    "subj_type": a[3][1],
                    "pred": b[3],
                    "obj": c[3][0],
                    "obj_type": c[3][1],
                    "subj_span": (a[0], a[1]),
                    "obj_span": (c[0], c[1]),
                }
            )
    return triples
