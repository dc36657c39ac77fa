"""Document-level pronominal coreference resolution (chain merging).

The reference parses *past* its corpus's coreference-chain section
(/root/reference/ontonotes5/utils.py:862-863 terminates before it; see
tests/data/sample_of_data.onf:373-393) — the north star re-adds coref
for chain merging (BASELINE.json:6, SURVEY.md §2.2 P6 note). Web pages
carry no gold chains, so the engine's equivalent is a deterministic
recency heuristic: a subject pronoun resolves to the nearest preceding
mention of a compatible entity type within the same document.

Chains produced here merge into triple extraction: a sentence
"He founded Globex." after "Einstein visited Paris." yields
(Einstein, founded, Globex).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from .lexicon import PREDICATE_VERBS
from .ner import bio_to_spans

_PREDICATES = frozenset(PREDICATE_VERBS)

# pronoun surface → compatible antecedent entity types, in priority order
PRONOUN_TYPES: Dict[str, Tuple[str, ...]] = {
    "He": ("PERSON",),
    "She": ("PERSON",),
    "It": ("ORG", "GPE", "PRODUCT", "FAC", "LOC"),
    "They": ("ORG", "PERSON", "NORP"),
    "he": ("PERSON",),
    "she": ("PERSON",),
    "it": ("ORG", "GPE", "PRODUCT", "FAC", "LOC"),
    "they": ("ORG", "PERSON", "NORP"),
}

Mention = Tuple[int, int, str, str]  # (start, end, surface, ent_type)


class CorefState:
    """Per-document antecedent tracker: most recent mention per type."""

    def __init__(self) -> None:
        self._latest: Dict[str, str] = {}

    def observe(self, mentions: List[Mention]) -> None:
        for _start, _end, surface, ent_type in mentions:
            self._latest[ent_type] = surface

    def resolve(self, pronoun: str) -> Optional[Tuple[str, str]]:
        """(antecedent surface, ent_type) for a pronoun, or None."""
        for ent_type in PRONOUN_TYPES.get(pronoun, ()):
            if ent_type in self._latest:
                return self._latest[ent_type], ent_type
        return None


def resolve_pronoun_items(
    tokens: List[str],
    bounds: List[Tuple[int, int]],
    bio: List[str],
    state: CorefState,
) -> List[Tuple[int, int, str, str]]:
    """Pronoun tokens outside any mention, resolved against the state:
    returns (start, end, antecedent_surface, ent_type) pseudo-mentions.
    The state must already reflect PRIOR sentences only — pronouns
    resolve backwards (cataphora is out of scope, like most heuristics).
    """
    resolved = []
    for tok, (s, e), tag in zip(tokens, bounds, bio):
        if tag == "O" and tok in PRONOUN_TYPES:
            antecedent = state.resolve(tok)
            if antecedent is not None:
                resolved.append((s, e, antecedent[0], antecedent[1]))
    return resolved


def extract_triples_with_coref(
    sentence_text: str,
    tokens: List[str],
    bounds: List[Tuple[int, int]],
    bio: List[str],
    state: CorefState,
    mention_spans: Optional[List[Tuple[int, int, str]]] = None,
) -> List[dict]:
    """Triple scan where resolved pronouns act as mentions carrying
    their antecedent's surface. The state is updated with this
    sentence's real mentions AFTER resolution (strictly backward).
    ``mention_spans`` (the `bio_to_spans` output) may be passed when the
    caller already computed it — e.g. the fused parse stage — to avoid
    a second run-length scan."""
    if mention_spans is None:
        mention_spans = bio_to_spans(bio, bounds)
    items: List[tuple] = []
    for start, end, etype in mention_spans:
        items.append((start, end, "M", (sentence_text[start:end], etype)))
    for start, end, surface, etype in resolve_pronoun_items(
        tokens, bounds, bio, state
    ):
        items.append((start, end, "M", (surface, etype)))
    mention_token_idx = {i for i, tag in enumerate(bio) if tag != "O"}
    for i, tok in enumerate(tokens):
        if i not in mention_token_idx and tok in _PREDICATES:
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
                    "pred": b[3],
                    "obj": c[3][0],
                    "subj_type": a[3][1],
                    "obj_type": c[3][1],
                    "subj_span": (a[0], a[1]),
                    "obj_span": (c[0], c[1]),
                }
            )
    state.observe(
        [(s, e, sentence_text[s:e], t) for s, e, t in mention_spans]
    )
    return triples
