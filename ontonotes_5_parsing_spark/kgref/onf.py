"""OntoNotes `.onf` document parsing — the reference's primary input
format, re-implemented fresh from its observable behavior so the engine
is a drop-in replacement for `ontonotes5_to_json`.

Composes the kernels: sentence sectioning (F17,
/root/reference/ontonotes5/utils.py:529-606), wrapped-line plain text
(F2, :52-56), bracketed-tree parsing (F3, kgref.tree), Leaves-block BIO
extraction (F4, :114-222), trace filtering + text patching (P2,
:627-656), exact→fuzzy alignment with escalating-cost restarts
(:658-706), and the morphology/syntax/entities record assembly
(W1-W3, kgref.tree.annotate_treebanked).

Golden conformance: `parse_onf` on the reference's own trilingual test
fixture must reproduce its expected JSON records field-for-field
(tests/test_onf.py vs /root/reference/tests/data/sample_of_res.json).
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

from .align import get_token_bounds_fuzzy
from .spans import check_bounds, get_token_bounds
from .tree import annotate_treebanked, filter_trace_tokens, is_trace_path, parse_tree

GLOBAL_SEPARATOR = "-" * 120
FINAL_SEPARATOR = "=" * 120

_TOKEN_LINE = re.compile(r"^\d+\s+.+")
_NAME_LINE = re.compile(r"^name:\s+\w+\s+\d+-\d+")

N_TOKENIZATION_RESTARTS = 5


def get_plain_text(lines: List[str], start: int, end: int) -> str:
    """Join wrapped lines with single spaces (F2 parity, utils.py:52-56)."""
    return " ".join(line.strip() for line in lines[start:end]).strip()


def parse_leaves_bio(
    lines: List[str], true_tokens: List[str], name_for_log: str = ""
) -> List[str]:
    """Leaves block → BIO tags aligned 1:1 with the tree's tokens
    (F4 parity, utils.py:114-222).

    Token lines are `<idx> <surface>` (index and surface must match the
    tree tokens in order); a `name: TYPE a-b` line inside a token's line
    range opens an entity covering tokens a..b (a must equal the current
    token index; TYPE must be uppercase). ValueError on any mismatch.
    """
    err = f"Leaves description is wrong! ({name_for_log})"
    token_line_ranges: List[Tuple[int, int]] = []
    token_idx = 0
    range_start = -1
    for line_idx, raw in enumerate(lines):
        line = raw.strip()
        m = _TOKEN_LINE.match(line)
        if m:
            if token_idx >= len(true_tokens):
                raise ValueError(err)
            parts = line[: m.end()].split()
            if parts[0].isdigit() and int(parts[0]) == token_idx and parts[1] == true_tokens[token_idx]:
                if range_start >= 0:
                    token_line_ranges.append((range_start, line_idx))
                range_start = line_idx
                token_idx += 1
    if range_start >= 0:
        token_line_ranges.append((range_start, len(lines)))
    if len(token_line_ranges) != len(true_tokens):
        raise ValueError(
            err + f" token/label count mismatch {len(true_tokens)} != {len(token_line_ranges)}"
        )

    bio: List[str] = []
    token_idx = 0
    while token_idx < len(true_tokens):
        line_start, line_end = token_line_ranges[token_idx]
        entity_type = ""
        entity_span: Tuple[int, int] | None = None
        for line_idx in range(line_start, line_end):
            line = lines[line_idx].strip()
            m = _NAME_LINE.match(line)
            if m:
                parts = line[: m.end()].split()
                if len(parts) != 3:
                    raise ValueError(err)
                entity_type = parts[1]
                if not entity_type.isupper():
                    raise ValueError(err)
                lo, hi = parts[2].split("-")
                if not (lo.isdigit() and hi.isdigit()):
                    raise ValueError(err)
                lo_i, hi_i = int(lo), int(hi)
                if lo_i > hi_i or lo_i != token_idx:
                    raise ValueError(err)
                entity_span = (lo_i, hi_i)
                break
        if entity_span is None:
            bio.append("O")
            token_idx += 1
        else:
            bio.append("B-" + entity_type)
            bio.extend("I-" + entity_type for _ in range(entity_span[1] - entity_span[0]))
            token_idx = entity_span[1] + 1
    return bio


def _align_tokens(plain_text: str, tokens: List[str]) -> List[Tuple[int, int]] | None:
    """Exact alignment, else fuzzy with the reference's escalating-cost
    restart schedule (utils.py:658-706): ins=del=1; then ins escalates
    +1 up to 5 restarts; then ins resets and del escalates."""
    try:
        return get_token_bounds(plain_text, tokens)
    except ValueError:
        pass

    def try_fuzzy(ins: float, dele: float):
        try:
            bounds = get_token_bounds_fuzzy(plain_text, tokens, ins, dele)
            if check_bounds(plain_text, bounds) == "" and len(bounds) == len(tokens):
                return bounds
        except Exception:  # noqa: BLE001 — reference swallows all errors here
            return None
        return None

    bounds = try_fuzzy(1.0, 1.0)
    if bounds is not None:
        return bounds
    ins = 1.0
    for _ in range(N_TOKENIZATION_RESTARTS):
        ins += 1.0
        bounds = try_fuzzy(ins, 1.0)
        if bounds is not None:
            return bounds
    dele = 1.0
    for _ in range(N_TOKENIZATION_RESTARTS):
        dele += 1.0
        bounds = try_fuzzy(1.0, dele)
        if bounds is not None:
            return bounds
    return None


def _find_block(lines: List[str], start: int, end: int, head: str, sep: str) -> int:
    try:
        idx = lines[start:end].index(head) + start
    except ValueError:
        return -1
    if idx + 1 >= len(lines) or lines[idx + 1] != sep:
        return -1
    return idx


def parse_onf(content: str, name_for_log: str = "") -> Tuple[List[Dict], str]:
    """One `.onf` document → (list of annotated-sentence records, error).

    Mirrors `parse_file` (utils.py:502-868): sections are scanned in
    order; the first malformed section stops parsing and returns the
    records collected so far plus a non-empty error string; the trailing
    coreference-chain section after the `===` separator is ignored.
    """
    lines = [line.strip() for line in content.splitlines()]
    if not lines:
        return [], f'File "{name_for_log}" is empty!'
    err_msg = f'File "{name_for_log}" has bad content!'
    try:
        start_idx = lines.index(GLOBAL_SEPARATOR)
    except ValueError:
        return [], err_msg

    records: List[Dict] = []
    while start_idx >= 0:
        end_idx = -1
        for sep in (GLOBAL_SEPARATOR, FINAL_SEPARATOR):
            try:
                end_idx = lines[start_idx + 1 :].index(sep) + start_idx + 1
                break
            except ValueError:
                continue
        if end_idx < 0:
            return records, err_msg

        plain_idx = _find_block(lines, start_idx, end_idx, "Plain sentence:", "---------------")
        tree_bank_idx = _find_block(
            lines, start_idx, end_idx, "Treebanked sentence:", "--------------------"
        )
        tree_idx = _find_block(lines, start_idx, end_idx, "Tree:", "-----")
        leaves_idx = _find_block(lines, start_idx, end_idx, "Leaves:", "-------")
        if not (start_idx < plain_idx < tree_bank_idx < tree_idx < leaves_idx):
            return records, err_msg

        plain_text = get_plain_text(lines, plain_idx + 2, tree_bank_idx)
        if not plain_text:
            return records, err_msg
        tree_text = get_plain_text(lines, tree_idx + 2, leaves_idx)
        try:
            tokens_with_paths = parse_tree(tree_text)
            bio = parse_leaves_bio(
                lines[leaves_idx + 2 : end_idx],
                [t for t, _ in tokens_with_paths],
                name_for_log,
            )
        except ValueError as exc:
            return records, str(exc)

        # P2: drop trace-path tokens (keeping BIO zip alignment), then
        # trace-surface tokens with text patching
        tokens_with_labels = [
            (tok, path, tag)
            for (tok, path), tag in zip(tokens_with_paths, bio)
            if not is_trace_path(path)
        ]
        if not tokens_with_labels:
            return records, err_msg
        plain_text, tokens_with_labels = filter_trace_tokens(
            plain_text, tokens_with_labels
        )

        bounds = _align_tokens(plain_text, [t for t, _, _ in tokens_with_labels])
        if bounds is None or not tokens_with_labels:
            return records, err_msg
        if len(bounds) != len(tokens_with_labels):
            raise ValueError(err_msg + " tokenization length mismatch")

        try:
            record = annotate_treebanked(plain_text, tokens_with_labels, bounds)
        except ValueError:
            return records, err_msg
        if not record["morphology"] or not record["syntax"]:
            return records, err_msg
        records.append(record)

        if lines[end_idx] == FINAL_SEPARATOR:
            start_idx = -1
        else:
            start_idx = end_idx
    return records, ""


def get_language_by_filename(path: str) -> str:
    """Language = path segment before 'annotations' (F15 parity,
    utils.py:986-999)."""
    parts = [p for p in path.replace("\\", "/").split("/") if p]
    for i, part in enumerate(parts):
        if part == "annotations" and i > 0:
            return parts[i - 1]
    return "unknown"
