"""kgref — the single-process reference extractor (conformance oracle).

Plays the role `parse_file` and friends play in the reference
(/root/reference/ontonotes5/utils.py): a pure-Python, dependency-free
(stdlib + numpy) implementation of every text/span kernel. The Spark
pipeline imports *these same functions* inside its pandas UDFs, which is
what makes the per-row byte-identity invariant (BASELINE.json:15) hold
by construction (SURVEY.md §7, hard part 1).

Nothing here is copied from the reference; each function is a fresh
implementation whose *behavior* matches the cited reference function.
"""

from .tokenize import tokenize_any_text, wordpunct_tokenize
from .spans import (
    merge_bounds,
    strip_bounds,
    unite_overlapped_bounds,
    insert_new_bounds,
    check_bounds,
    get_token_bounds,
)
from .align import levenshtein, find_subword_bounds, get_token_bounds_fuzzy
from .distance import label_distance, find_nearest_label
from .extract import extract_text, split_sentences
from .ner import tag_bio, bio_to_spans, annotate_sentence
from .triples import extract_triples, PREDICATES

__all__ = [
    "tokenize_any_text",
    "wordpunct_tokenize",
    "merge_bounds",
    "strip_bounds",
    "unite_overlapped_bounds",
    "insert_new_bounds",
    "check_bounds",
    "get_token_bounds",
    "levenshtein",
    "find_subword_bounds",
    "get_token_bounds_fuzzy",
    "label_distance",
    "find_nearest_label",
    "extract_text",
    "split_sentences",
    "tag_bio",
    "bio_to_spans",
    "annotate_sentence",
    "extract_triples",
    "PREDICATES",
]
