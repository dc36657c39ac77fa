"""Language identification + quality scoring heuristics (pure Python
oracles for the engine's text-analysis operators).

Language ID generalizes the reference's path-based language tagging
(`get_language_by_filename`, /root/reference/ontonotes5/utils.py:986-999)
to content-based detection for web pages, using script ranges plus a
stopword-hit heuristic over the engine's three corpus languages.
"""

from __future__ import annotations

import re
from typing import Dict

_ARABIC = re.compile(r"[؀-ۿ]")
_CJK = re.compile(r"[가-힣぀-ヿ一-鿿]")
_EN_STOPWORDS = frozenset(
    ["the", "a", "and", "of", "to", "in", "that", "this", "while", "about"]
)

LANGS = ("english", "arabic", "chinese")


def detect_language(text: str) -> str:
    """Script-range counting with an English-stopword fallback.

    Deterministic: the language whose evidence count is highest wins;
    ties break by the fixed LANGS order (english, arabic, chinese).
    """
    if not text:
        return "english"
    n_arabic = len(_ARABIC.findall(text))
    n_cjk = len(_CJK.findall(text))
    words = re.findall(r"[a-zA-Z]+", text.lower())
    n_en = sum(1 for w in words if w in _EN_STOPWORDS) + len(words) // 4
    scores = {"english": n_en, "arabic": n_arabic, "chinese": n_cjk}
    return max(LANGS, key=lambda lang: scores[lang])


def quality_score(text: str) -> Dict[str, float]:
    """Length / punctuation / stopword quality signals, rounded to 4
    decimals (shared formula with the Spark operator)."""
    n_chars = len(text)
    if n_chars == 0:
        return {
            "n_chars": 0, "n_words": 0, "mean_word_len": 0.0,
            "punct_ratio": 0.0, "stopword_ratio": 0.0, "alpha_ratio": 0.0,
        }
    words = text.split()
    n_words = len(words)
    n_punct = len(re.findall(r"[^\w\s]", text))
    n_alpha = len(re.findall(r"[^\W\d_]", text))
    n_stop = sum(1 for w in words if w.lower().strip(".,!?") in _EN_STOPWORDS)
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": round(sum(len(w) for w in words) / max(n_words, 1), 4),
        "punct_ratio": round(n_punct / n_chars, 4),
        "stopword_ratio": round(n_stop / max(n_words, 1), 4),
        "alpha_ratio": round(n_alpha / n_chars, 4),
    }
