"""ONF corpus mode: golden end-to-end conformance against the
reference's own fixture + the Spark source / split routing / JSON sink.

The fixture is read IN PLACE from /root/reference/tests/data (read-only
reference material; nothing is copied into this repo)."""

import json
import os
import shutil

import pytest

from ontonotes_5_parsing_spark.kgref.onf import (
    get_language_by_filename,
    parse_leaves_bio,
    parse_onf,
)
from ontonotes_5_parsing_spark.kgref.spans import strip_bounds

FIXTURE_ONF = "/root/reference/tests/data/sample_of_data.onf"
FIXTURE_JSON = "/root/reference/tests/data/sample_of_res.json"

needs_fixture = pytest.mark.skipif(
    not (os.path.exists(FIXTURE_ONF) and os.path.exists(FIXTURE_JSON)),
    reason="reference fixture not available",
)


@needs_fixture
def test_golden_parse_onf_matches_reference_output():
    """Field-for-field agreement with the reference's expected JSON,
    under the reference's own comparison (its golden test strips the
    fixture's bounds before comparing, tests/test_utils.py:586-620)."""
    content = open(FIXTURE_ONF, encoding="utf-8", errors="ignore").read()
    records, err = parse_onf(content, "sample_of_data.onf")
    expected = json.load(open(FIXTURE_JSON))
    assert err == ""
    assert len(records) == len(expected) == 5
    for got, exp in zip(records, expected):
        assert got["text"] == exp["text"]
        for part in ("morphology", "syntax", "entities"):
            assert sorted(got[part]) == sorted(exp[part])
            for tag in got[part]:
                true_bounds = strip_bounds(
                    exp["text"], [tuple(b) for b in exp[part][tag]]
                )
                assert [tuple(b) for b in got[part][tag]] == true_bounds, (
                    part, tag)


def test_parse_leaves_bio():
    lines = [
        "0   In",
        "1   the",
        '       name:  DATE               1-4    the summer of 2005',
        "2   summer",
        "3   of",
        "4   2005",
        "5   ,",
    ]
    tokens = ["In", "the", "summer", "of", "2005", ","]
    assert parse_leaves_bio(lines, tokens) == [
        "O", "B-DATE", "I-DATE", "I-DATE", "I-DATE", "O",
    ]


def test_parse_leaves_bio_errors():
    with pytest.raises(ValueError):
        # name bounds not starting at the token index
        parse_leaves_bio(["0  a", "   name: GPE 1-2", "1  b"], ["a", "b"])
    with pytest.raises(ValueError):
        # token mismatch → count mismatch
        parse_leaves_bio(["0  a", "1  XX"], ["a", "b"])


def test_language_from_path():
    assert get_language_by_filename(
        "x/ontonotes-release-5.0/data/files/data/english/annotations/bc/doc.onf"
    ) == "english"
    assert get_language_by_filename("a/b/doc.onf") == "unknown"


@needs_fixture
def test_spark_onf_source_and_routing(spark, tmp_path):
    from ontonotes_5_parsing_spark.sources import (
        load_split_ids,
        onf_annotations,
        onf_to_json,
        route_by_id_lists,
    )

    # corpus dir mimicking the OntoNotes layout (language in the path)
    corpus = tmp_path / "corpus" / "english" / "annotations" / "bc" / "cctv" / "00"
    corpus.mkdir(parents=True)
    shutil.copy(FIXTURE_ONF, corpus / "cctv_0000.onf")
    (tmp_path / "corpus" / "english" / "annotations" / "bc" / "junk.txt").write_text(
        "not onf"
    )

    ann = onf_annotations(spark, str(tmp_path / "corpus"))
    rows = ann.collect()
    assert len(rows) == 5  # junk.txt excluded by pathGlobFilter
    assert all(r.error is None for r in rows)
    assert all(r.lang == "english" for r in rows)
    expected = json.load(open(FIXTURE_JSON))
    assert sorted(r.text for r in rows) == sorted(e["text"] for e in expected)

    # id lists: route this doc to test via suffix matching (J1)
    ids = tmp_path / "ids" / "all"
    ids.mkdir(parents=True)
    (ids / "train.id").write_text("bc/other/00/other_0000\n")
    (ids / "development.id").write_text("\n")
    (ids / "test.id").write_text("bc/cctv/00/cctv_0000\n")
    split_ids = load_split_ids(spark, str(tmp_path / "ids"))
    routed = route_by_id_lists(ann, split_ids)
    assert {r.split for r in routed.collect()} == {"test"}

    # full lifecycle with JSON sink + stats
    out = str(tmp_path / "json_out")
    stats = onf_to_json(spark, str(tmp_path / "corpus"), str(tmp_path / "ids"), out)
    assert stats["n_sentences"] == 5
    assert stats["n_docs_with_errors"] == 0
    assert stats["by_split_lang"] == [
        {"split": "test", "lang": "english", "count": 5}
    ]
    reloaded = spark.read.json(out)
    assert reloaded.count() == 5
