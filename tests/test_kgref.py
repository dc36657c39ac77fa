"""Unit tests for the kgref oracle kernels.

Expectation vectors are ported from the reference's own test suite
(/root/reference/tests/test_utils.py — cited per test) so behavior
parity is checked directly, without importing reference code.
"""

import pytest

from ontonotes_5_parsing_spark.kgref import (
    check_bounds,
    extract_text,
    find_subword_bounds,
    get_token_bounds,
    get_token_bounds_fuzzy,
    insert_new_bounds,
    label_distance,
    levenshtein,
    merge_bounds,
    split_sentences,
    strip_bounds,
    tokenize_any_text,
    unite_overlapped_bounds,
)


# ---- tokenizer (reference tests/test_utils.py:1508-1522) ----
def test_tokenize_plain():
    assert tokenize_any_text("Hello, world!") == ["Hello", ",", "world", "!"]


def test_tokenize_cjk_only():
    assert tokenize_any_text("天地方益権") == ["天", "地", "方", "益", "権"]


def test_tokenize_mixed():
    assert tokenize_any_text("hello?天地方3 d gh益権, world!") == [
        "hello", "?", "天", "地", "方", "3", "d", "gh", "益", "権", ",", "world", "!",
    ]


# ---- exact token bounds (reference tests/test_utils.py:688-788) ----
SENT = (
    "With their unique charm, these well-known cartoon images once again "
    "caused Hong Kong to be a focus of worldwide attention."
)
SENT_TOKENS = [
    "With", "their", "unique", "charm", ",", "these", "well", "-", "known",
    "cartoon", "images", "once", "again", "caused", "Hong", "Kong", "to",
    "be", "a", "focus", "of", "worldwide", "attention", ".",
]
SENT_BOUNDS = [
    (0, 4), (5, 10), (11, 17), (18, 23), (23, 24), (25, 30), (31, 35),
    (35, 36), (36, 41), (42, 49), (50, 56), (57, 61), (62, 67), (68, 74),
    (75, 79), (80, 84), (85, 87), (88, 90), (91, 92), (93, 98), (99, 101),
    (102, 111), (112, 121), (121, 122),
]


def test_get_token_bounds_exact():
    assert get_token_bounds(SENT, SENT_TOKENS) == SENT_BOUNDS


def test_get_token_bounds_missing_token_raises():
    bad = SENT.replace("unique", "unque")
    with pytest.raises(ValueError):
        get_token_bounds(bad, SENT_TOKENS)


# ---- fuzzy alignment (reference tests/test_utils.py:790-916) ----
def test_fuzzy_equal_counts_passthrough():
    assert get_token_bounds_fuzzy(SENT, SENT_TOKENS) == SENT_BOUNDS


def test_fuzzy_misspelled_text():
    # reference test_get_token_bounds_fuzzy_pos02: text misspells
    # "unique"→"unque" and the last treebank token is "atention";
    # token counts still match → source-token bounds win.
    text = SENT.replace("unique", "unque")
    tokens = SENT_TOKENS[:-2] + ["atention", "."]
    expected = [
        (0, 4), (5, 10), (11, 16), (17, 22), (22, 23), (24, 29), (30, 34),
        (34, 35), (35, 40), (41, 48), (49, 55), (56, 60), (61, 66), (67, 73),
        (74, 78), (79, 83), (84, 86), (87, 89), (90, 91), (92, 97), (98, 100),
        (101, 110), (111, 120), (120, 121),
    ]
    assert get_token_bounds_fuzzy(text, tokens) == expected


def test_fuzzy_clitic_split_invariants():
    # Arabic-style clitic splitting: more treebank tokens than source
    # tokens; property-style checks as in reference tests :918-1178 —
    # monotone, in-bounds, full coverage of each source word.
    text = "wal-kitab qara'a"
    tokens = ["wa", "l", "-", "kitab", "qara'a"]
    bounds = get_token_bounds_fuzzy(text, tokens)
    assert bounds == sorted(bounds)
    for s, e in bounds:
        assert 0 <= s < e <= len(text)
        assert text[s:e].strip() == text[s:e]


# ---- subword bounds (reference tests/test_utils.py:1474-1506) ----
@pytest.mark.parametrize(
    "word,subwords,expected",
    [
        ("12345", ["1", "2", "3", "4", "5"], [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]),
        ("12345", ["1", "2", "3", "4a", "5"], [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]),
        ("1234a5", ["1", "2", "3", "4", "5"], [(0, 1), (1, 2), (2, 3), (3, 4), (4, 6)]),
        ("1234a5", ["1", "2", "3", "4b", "5"], [(0, 1), (1, 2), (2, 3), (3, 5), (5, 6)]),
    ],
)
def test_find_subword_bounds(word, subwords, expected):
    bounds, _ = find_subword_bounds(word, subwords)
    assert bounds == expected


def test_find_subword_bounds_too_short_raises():
    with pytest.raises(ValueError):
        find_subword_bounds("1234", ["1", "2", "3", "4", "5"])


# ---- span algebra (reference tests/test_utils.py:96-136,1239-1472) ----
def test_merge_bounds_drops_overlaps():
    assert merge_bounds([(0, 3), (2, 5), (5, 8)]) == [(0, 3), (5, 8)]


def test_strip_bounds():
    assert strip_bounds(" ab  cd ", [(0, 4), (4, 8)]) == [(1, 3), (5, 7)]


def test_unite_overlapped():
    assert unite_overlapped_bounds([(0, 3), (2, 5), (7, 9)]) == [(0, 5), (7, 9)]


def test_unite_out_of_order_raises():
    with pytest.raises(ValueError):
        unite_overlapped_bounds([(4, 6), (0, 2)])


def test_insert_new_bounds_disjoint():
    assert insert_new_bounds((4, 7), [(0, 2), (8, 10)]) == [(0, 2), (4, 7), (8, 10)]


def test_insert_new_bounds_merging():
    # overlaps both neighbors → single united span (bitmap-union parity)
    assert insert_new_bounds((1, 9), [(0, 2), (8, 10)]) == [(0, 10)]


def test_insert_new_bounds_touching_merges():
    # adjacent bitmap cells fuse: (0,2)+(2,4) → (0,4)
    assert insert_new_bounds((2, 4), [(0, 2)]) == [(0, 4)]


def test_insert_new_bounds_invalid_old_list_raises():
    with pytest.raises(ValueError):
        insert_new_bounds((0, 1), [(5, 4)])


def test_check_bounds_ok_and_errors():
    assert check_bounds("hello world", [(0, 5), (6, 11)]) == ""
    assert "start_pos" in check_bounds("hello world", [(3, 3)])
    assert "prev_pos" in check_bounds("hello world", [(0, 5), (4, 8)])
    assert "len(text)" in check_bounds("hi", [(0, 5)])
    assert "empty" in check_bounds("a   b", [(1, 3)])
    assert "strip" in check_bounds("a b", [(0, 2)])


# ---- levenshtein / label distance (reference tests :1293-1316) ----
def test_levenshtein():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "abc") == 0


def test_label_distance_semantics():
    assert label_distance("NP", "NP") == 0
    assert label_distance(" NP ", "NP") == 0
    assert label_distance("NP-SBJ", "NP") == 2  # prefix after part-join
    assert label_distance("NP.SBJ", "NP-SBJ") == 1  # same after normalize
    assert label_distance("!!", "ABC") == 50  # alpha-ness mismatch ×10
    assert label_distance("NP-SBJ", "NP-OBJ") == levenshtein("SBJ", "OBJ") + 2
    assert label_distance("VP", "NP") == levenshtein("VP", "NP") * 10 + 2


# ---- extraction determinism ----
def test_extract_text_drops_boilerplate():
    html = (
        b"<html><head><title>T</title><script>var x=1;</script></head>"
        b"<body><nav><li>Home</li></nav><p>Hello &amp; goodbye.</p>"
        b"<footer>c</footer></body></html>"
    )
    assert extract_text(html) == "Hello & goodbye."


def test_split_sentences_multiscript():
    text = "One sentence. Two sentence!\nThird line? 好句子。"
    assert split_sentences(text) == [
        "One sentence.", "Two sentence!", "Third line?", "好句子。",
    ]
