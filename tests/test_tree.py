"""Constituency-tree kernels vs the reference's own test vectors
(/root/reference/tests/test_utils.py:138-197) + trace filtering and
treebank annotation assembly."""

import pytest

from ontonotes_5_parsing_spark.kgref.spans import get_token_bounds
from ontonotes_5_parsing_spark.kgref.tree import (
    annotate_treebanked,
    filter_trace_tokens,
    is_trace_path,
    parse_tree,
)

HK_TREE = (
    "(TOP (S (PP (IN With) (NP (PRP$ their) (JJ unique) (NN charm))) (, ,) "
    "(NP-SBJ (DT these) (ADJP (RB well) (HYPH -) (VBN known)) (NN cartoon) "
    "(NNS images)) (ADVP-TMP (RB once) (RB again)) (VP (VBD caused) "
    "(S (NP-SBJ (NNP Hong) (NNP Kong)) (VP (TO to) (VP (VB be) "
    "(NP-PRD (NP (DT a) (NN focus)) (PP (IN of) (NP (JJ worldwide) "
    "(NN attention)))))))) (. .)))"
)


def test_parse_tree_empty():
    assert parse_tree("") == []


def test_parse_tree_single_leaf():
    assert parse_tree("(DT the)") == [("the", ["DT"])]


def test_parse_tree_nested():
    assert parse_tree("(PP (IN by) (NP-LGS (DT the) (JJ Israeli) (NNP Army)))") == [
        ("by", ["PP", "IN"]),
        ("the", ["PP", "NP-LGS", "DT"]),
        ("Israeli", ["PP", "NP-LGS", "JJ"]),
        ("Army", ["PP", "NP-LGS", "NNP"]),
    ]


def test_parse_tree_deep():
    res = parse_tree(HK_TREE)
    assert len(res) == 24
    assert res[0] == ("With", ["TOP", "S", "PP", "IN"])
    assert res[14] == ("Hong", ["TOP", "S", "VP", "S", "NP-SBJ", "NNP"])
    assert res[-1] == (".", ["TOP", "S", "."])


@pytest.mark.parametrize(
    "bad", ["(DT", "DT the)", "(DT the) extra", "((DT the))x", "(NP (DT the) two words)"]
)
def test_parse_tree_malformed_raises(bad):
    with pytest.raises(ValueError):
        parse_tree(bad)


def test_trace_path_detection():
    assert is_trace_path(["TOP", "S", "-NONE-"])
    assert is_trace_path(["TOP", "EDITED", "NP"])
    assert not is_trace_path(["TOP", "S", "NP-SBJ"])


def test_filter_trace_tokens_patches_text():
    tokens = [
        ("the", ["S", "DT"], "O"),
        ("*T*-1", ["S", "-NONE-"], "O"),  # trace path → dropped, no patch
        ("-LRB-", ["S", "PUNC"], "O"),  # trace surface → dropped + patched
        ("cat", ["S", "NN"], "O"),
    ]
    text, kept = filter_trace_tokens("the -LRB- cat", tokens)
    assert [t[0] for t in kept] == ["the", "cat"]
    assert text == "the cat"


def test_annotate_treebanked_full_record():
    text = "With their unique charm, these well-known cartoon images once again caused Hong Kong to be a focus of worldwide attention."
    toks = parse_tree(HK_TREE)
    bio = ["O"] * len(toks)
    bio[14], bio[15] = "B-GPE", "I-GPE"
    tokens_with_labels = [(t, p, b) for (t, p), b in zip(toks, bio)]
    bounds = get_token_bounds(text, [t for t, _, _ in tokens_with_labels])
    record = annotate_treebanked(text, tokens_with_labels, bounds)
    assert record["entities"] == {"GPE": [(75, 84)]}  # "Hong Kong" (ext. to next token start, stripped)
    assert record["morphology"]["NNP"] == [(75, 79), (80, 84)]  # Hong, Kong
    assert (0, len(text)) not in record["syntax"].get("S", [])
    assert "TOP" in record["syntax"] or all(
        sp != (0, len(text)) for sps in record["syntax"].values() for sp in sps
    )
    # every span list is valid
    from ontonotes_5_parsing_spark.kgref.spans import check_bounds

    for section in ("morphology", "syntax", "entities"):
        for spans in record[section].values():
            assert check_bounds(text, spans) == ""


def test_annotate_treebanked_whole_sentence_demotion():
    # single-token sentence: every depth covers [0, len) → W3 keeps one
    text = "Go"
    tokens_with_labels = [("Go", ["TOP", "S", "VP", "VB"], "O")]
    record = annotate_treebanked(text, tokens_with_labels, [(0, 2)])
    # reference keeps the alphabetically-first whole-sentence tag
    # (sorted(keys) loop at utils.py:811-825) — here 'S', not 'TOP'
    assert record["syntax"] == {"S": [(0, 2)]}
    assert record["morphology"] == {"VB": [(0, 2)]}
