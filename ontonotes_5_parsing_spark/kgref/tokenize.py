"""CJK-aware tokenization (reference parity: F1 in SURVEY.md §2.8).

Behavior matches `tokenize_any_text` at
/root/reference/ontonotes5/utils.py:12-49: CJK runs (Hangul, Kana,
CJK-Unified) are split into single characters; everything else is
word-punct tokenized. The reference delegates to
`nltk.wordpunct_tokenize`; nltk's WordPunctTokenizer is the regex
``\\w+|[^\\w\\s]+`` (public NLTK docs), re-implemented here so the
engine has zero non-numpy dependencies.
"""

from __future__ import annotations

import re
from typing import List

_WORDPUNCT = re.compile(r"\w+|[^\w\s]+", re.UNICODE)

# Hangul syllables, Hiragana+Katakana, CJK Unified Ideographs —
# the same three ranges the reference matches (utils.py:13-15).
_CJK_RUN = re.compile(r"[가-힣]+|[぀-ヿ]+|[一-鿿]+")


def wordpunct_tokenize(s: str) -> List[str]:
    """``\\w+|[^\\w\\s]+`` tokenizer (nltk.wordpunct_tokenize semantics)."""
    return _WORDPUNCT.findall(s)


def tokenize_with_bounds(s: str):
    """``(tokens, bounds)`` in one regex pass (no-CJK fast path).

    Equivalent to ``tokenize_any_text`` + ``spans.get_token_bounds``:
    the wordpunct pattern tiles the text leaving only whitespace
    between matches, and tokens are non-empty and whitespace-free, so
    ``text.find(tok, prev_end)`` lands exactly on each match start —
    ``finditer`` yields the same bounds without the per-token scan.
    CJK text falls back to the tokenize-then-find composition.
    """
    if _CJK_RUN.search(s):
        from .spans import get_token_bounds

        tokens = tokenize_any_text(s)
        return tokens, get_token_bounds(s, tokens)
    tokens: List[str] = []
    bounds = []
    for m in _WORDPUNCT.finditer(s):
        tokens.append(m.group(0))
        bounds.append((m.start(), m.end()))
    return tokens, bounds


def tokenize_any_text(s: str) -> List[str]:
    """Tokenize text of any script.

    CJK runs become one token per character; the non-CJK segments
    between runs are word-punct tokenized. With no CJK present this is
    exactly ``wordpunct_tokenize``.
    """
    matches = list(_CJK_RUN.finditer(s))
    if not matches:
        return wordpunct_tokenize(s)
    tokens: List[str] = []
    pos = 0
    for m in matches:
        seg = s[pos : m.start()]
        if seg.strip():
            tokens.extend(wordpunct_tokenize(seg.strip()))
        run = m.group(0)
        tokens.extend(run[i : i + 1] for i in range(len(run)))
        pos = m.end()
    tail = s[pos:]
    if tail.strip():
        tokens.extend(wordpunct_tokenize(tail))
    return tokens
