"""Deterministic trafilatura-style HTML→text extraction + sentence split.

This is the per-row invariant function of the whole engine
(BASELINE.json:15: "byte-identical extracted text per url"): the Spark
`extract_text` pandas UDF imports *this* function, so the distributed
output equals the single-process output by construction.

Plays the role of the reference's member-extraction + plain-text
assembly (`get_plain_text`, /root/reference/ontonotes5/utils.py:52-56,
and the whitespace squeeze at utils.py:651-656), generalized from `.onf`
members to HTML bytes.
"""

from __future__ import annotations

import html as _html
import re
from typing import List

# elements whose entire subtree is boilerplate, dropped wholesale
_DROP_BLOCK = re.compile(
    r"(?is)<(script|style|nav|header|footer|aside|noscript|template|title)\b[^>]*>"
    r".*?</\1\s*>"
)
_COMMENT = re.compile(r"(?s)<!--.*?-->")
# block-level boundaries become newlines so paragraphs survive tag removal
_BLOCK_TAG = re.compile(
    r"(?i)</?(p|div|br|hr|h[1-6]|li|ul|ol|dl|dt|dd|tr|td|th|table|thead|"
    r"tbody|article|section|main|blockquote|pre|figure|figcaption)\b[^>]*/?>"
)
_ANY_TAG = re.compile(r"<[^>]+>")
_MULTI_SPACE = re.compile(r"[ \t\r\f\v ]+")


def extract_text(html_bytes: bytes) -> str:
    """Extract readable text from HTML bytes, deterministically.

    Boilerplate subtrees (script/style/nav/header/footer/aside) are
    dropped; block tags become line breaks; inline tags vanish; HTML
    entities are unescaped; whitespace is squeezed per line; blank
    lines are dropped; lines are joined with '\\n'.
    """
    if html_bytes is None:
        return ""
    raw = html_bytes.decode("utf-8", errors="replace") if isinstance(
        html_bytes, (bytes, bytearray)
    ) else str(html_bytes)
    s = _COMMENT.sub("", raw)
    # iterate: nested drop-blocks (e.g. <div> inside <nav>) need re-scan
    prev = None
    while prev != s:
        prev = s
        s = _DROP_BLOCK.sub("", s)
    s = _BLOCK_TAG.sub("\n", s)
    s = _ANY_TAG.sub("", s)
    s = _html.unescape(s)
    # one squeeze pass over the whole document, then per-line strip:
    # byte-identical to squeezing per line (the class excludes \n, so no
    # substitution crosses a line) at ~1/30th the regex invocations
    s = _MULTI_SPACE.sub(" ", s)
    lines = []
    for line in s.split("\n"):
        stripped = line.strip()
        if stripped:
            lines.append(stripped)
    return "\n".join(lines)


# sentence-final punctuation across the corpus's three scripts
_SENT_END = re.compile(r"(?<=[.!?؟。！？])\s+")


def split_sentences(text: str) -> List[str]:
    """Split extracted text into sentences, deterministically.

    Paragraphs (lines) are hard boundaries; within a paragraph, split
    after sentence-final punctuation followed by whitespace. Analog of
    the reference's per-sentence sectioning of `.onf` blocks
    (/root/reference/ontonotes5/utils.py:529-606).
    """
    sentences: List[str] = []
    for para in text.split("\n"):
        for sent in _SENT_END.split(para):
            sent = sent.strip()
            if sent:
                sentences.append(sent)
    return sentences
