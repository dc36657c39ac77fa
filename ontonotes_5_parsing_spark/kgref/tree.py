"""Constituency-tree kernels: parse, trace filtering, treebank
annotation assembly (reference parity: F3, P2/P3, W2, W3 — SURVEY.md
§2.8/§2.5).

These give the engine a *treebank mode*: inputs that carry bracketed
constituency trees (the OntoNotes shape) are annotated with the same
morphology/syntax/entities record the reference emits
(/root/reference/ontonotes5/utils.py:732-860). Fresh implementations;
behavior checked against the reference's own test vectors
(tests/test_utils.py:138-197) and error contracts.
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple

from .spans import (
    Span,
    check_bounds,
    merge_bounds,
    strip_bounds,
    unite_overlapped_bounds,
)

# trace / disfluency labels: -NONE-, -LRB-, EDITED, ... (utils.py:505)
TRACE_RE = re.compile(r"^(-[A-Z]+-|EDITED)$")


def parse_tree(tree: str) -> List[Tuple[str, List[str]]]:
    """Bracketed constituency tree → [(token, root-to-leaf tag path)].

    Parity with `parse_tree` (utils.py:59-111): same outputs, ValueError
    on malformed input (unbalanced brackets, multi-word labels, stray
    text between brackets). Recursive descent instead of the reference's
    bracket-scan + tag stack.
    """
    s = tree.strip()
    if not s:
        return []
    err_msg = f'"{tree}" is wrong syntax tree!'
    out: List[Tuple[str, List[str]]] = []
    pos = 0
    n = len(s)

    def skip_ws() -> None:
        nonlocal pos
        while pos < n and s[pos].isspace():
            pos += 1

    def parse_node(path: List[str]) -> None:
        nonlocal pos
        if pos >= n or s[pos] != "(":
            raise ValueError(err_msg)
        pos += 1
        skip_ws()
        # label runs to whitespace / '(' / ')'
        label_start = pos
        while pos < n and not s[pos].isspace() and s[pos] not in "()":
            pos += 1
        label = s[label_start:pos]
        if not label:
            raise ValueError(err_msg)
        skip_ws()
        if pos < n and s[pos] == "(":
            while pos < n and s[pos] == "(":
                parse_node(path + [label])
                skip_ws()
            if pos >= n or s[pos] != ")":
                raise ValueError(err_msg)
            pos += 1
        else:
            token_start = pos
            while pos < n and s[pos] != ")":
                pos += 1
            if pos >= n:
                raise ValueError(err_msg)
            token = s[token_start:pos].strip()
            if not token or len(token.split()) != 1:
                raise ValueError(tree)
            out.append((token, path + [label]))
            pos += 1

    parse_node([])
    skip_ws()
    if pos != n:
        raise ValueError(err_msg)
    return out


def is_trace_path(tag_path: Sequence[str]) -> bool:
    """P2/P3: any path element matching the trace regex (`is_item_in_
    sequence`, utils.py:489-499, with the utils.py:505 pattern)."""
    return any(TRACE_RE.search(t) for t in tag_path)


def filter_trace_tokens(
    plain_text: str,
    tokens_with_labels: List[Tuple[str, List[str], str]],
) -> Tuple[str, List[Tuple[str, List[str], str]]]:
    """Drop trace tokens and patch the plain text (utils.py:627-656):

    1. tokens whose tag path hits the trace regex are removed;
    2. tokens whose *surface* hits it are removed and each occurrence
       in the text replaced by a space;
    3. whitespace is squeezed to fixpoint and the text stripped.
    """
    kept = [t for t in tokens_with_labels if not is_trace_path(t[1])]
    final: List[Tuple[str, List[str], str]] = []
    for token in kept:
        if TRACE_RE.search(token[0]):
            plain_text = plain_text.replace(token[0], " ")
        else:
            final.append(token)
    squeezed = plain_text.replace("  ", " ")
    while squeezed != plain_text:
        plain_text = squeezed
        squeezed = plain_text.replace("  ", " ")
    return plain_text.strip(), final


def annotate_treebanked(
    plain_text: str,
    tokens_with_labels: List[Tuple[str, List[str], str]],
    bounds_of_tokens: List[Span],
) -> Dict:
    """Assemble the reference's annotated-sentence record from aligned
    treebank tokens: morphology (leaf tag per token), entities (BIO over
    tokens — note the reference extends each entity to the *next
    token's start* rather than the previous token's end, utils.py:
    744-767, reproduced exactly), syntax (per-depth maximal runs of one
    tag, W2 utils.py:769-809), whole-sentence tag demotion (W3
    utils.py:810-834), then strip + unite + validation (utils.py:841-860).
    """
    record: Dict = {
        "text": plain_text,
        "morphology": {},
        "syntax": {},
        "entities": {},
    }
    # morphology + entities in one pass over tokens
    previous_entity = "O"
    entity_start = -1
    for (token, path, bio_tag), (tok_start, tok_end) in zip(
        tokens_with_labels, bounds_of_tokens
    ):
        record["morphology"].setdefault(path[-1], []).append((tok_start, tok_end))
        if bio_tag == "O":
            if previous_entity != "O":
                record["entities"].setdefault(previous_entity, []).append(
                    (entity_start, tok_start)
                )
                previous_entity = "O"
                entity_start = -1
        elif bio_tag.startswith("B-"):
            if previous_entity != "O":
                record["entities"].setdefault(previous_entity, []).append(
                    (entity_start, tok_start)
                )
            entity_start = tok_start
            previous_entity = bio_tag[2:]
    if previous_entity != "O":
        record["entities"].setdefault(previous_entity, []).append(
            (entity_start, len(plain_text))
        )

    # syntax: per-depth maximal runs (W2)
    has_syntax = any(len(path) > 1 for _, path, _ in tokens_with_labels)
    if has_syntax:
        max_depth = max(len(path) - 1 for _, path, _ in tokens_with_labels)
        for depth in range(max_depth):
            run_tag = ""
            run_start = run_end = -1
            for (_, path, _), (tok_start, tok_end) in zip(
                tokens_with_labels, bounds_of_tokens
            ):
                if len(path) - 1 > depth:
                    if run_tag == path[depth]:
                        run_end = tok_end
                    else:
                        if run_tag:
                            record["syntax"].setdefault(run_tag, []).append(
                                (run_start, run_end)
                            )
                        run_tag = path[depth]
                        run_start, run_end = tok_start, tok_end
                else:
                    if run_tag:
                        record["syntax"].setdefault(run_tag, []).append(
                            (run_start, run_end)
                        )
                        run_tag = ""
                        run_start = run_end = -1
            if run_tag:
                record["syntax"].setdefault(run_tag, []).append((run_start, run_end))

        # whole-sentence demotion (W3): drop [0, len) spans, but keep the
        # first such tag if syntax would otherwise vanish
        whole_sentence_tag = None
        for tag in sorted(record["syntax"]):
            spans = sorted(record["syntax"][tag], key=lambda sp: (sp[0], sp[0] - sp[1]))
            while spans and spans[0] == (0, len(plain_text)):
                if whole_sentence_tag is None:
                    whole_sentence_tag = {tag: [(0, len(plain_text))]}
                spans = spans[1:]
            spans = merge_bounds(spans)
            if spans:
                record["syntax"][tag] = spans
            else:
                del record["syntax"][tag]
        if not record["syntax"]:
            if whole_sentence_tag is None:
                raise ValueError("sentence has no syntax spans")
            record["syntax"] = whole_sentence_tag

    # strip + unite + validate every span list (utils.py:841-860)
    for section in ("morphology", "syntax", "entities"):
        for tag, spans in list(record[section].items()):
            stripped = strip_bounds(plain_text, spans)
            err = check_bounds(plain_text, stripped)
            if err:
                raise ValueError(f"{tag} in {section}: {err}")
            record[section][tag] = unite_overlapped_bounds(sorted(stripped))
    return record
