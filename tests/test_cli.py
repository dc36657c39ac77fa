"""CLI parity with the reference's three console scripts
(/root/reference/setup.py:61-67): to_json (incl. .tgz source),
reduce_entities, show_statistics — exercised end-to-end on the
reference's own .onf fixture (read in place, never copied)."""

import json
import os
import shutil
import tarfile

import pytest

from ontonotes_5_parsing_spark import cli

FIXTURE_ONF = "/root/reference/tests/data/sample_of_data.onf"

needs_fixture = pytest.mark.skipif(
    not os.path.exists(FIXTURE_ONF), reason="reference fixture not available"
)


@pytest.fixture()
def corpus_tgz(tmp_path):
    root = tmp_path / "corpus" / "english" / "annotations" / "bc" / "cctv" / "00"
    root.mkdir(parents=True)
    shutil.copy(FIXTURE_ONF, root / "cctv_0000.onf")
    tgz = tmp_path / "corpus.tgz"
    with tarfile.open(tgz, "w:gz") as tf:
        tf.add(tmp_path / "corpus", arcname=".")
    return str(tgz)


@needs_fixture
def test_cli_full_lifecycle(spark, corpus_tgz, tmp_path, capsys):
    ds_dir = str(tmp_path / "dataset")
    rc = cli.main(["to_json", "-s", corpus_tgz, "-d", ds_dir, "-r", "42"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_sentences"] == 5
    assert stats["n_docs_with_errors"] == 0
    assert any(row["lang"] == "english" for row in stats["by_split_lang"])

    red_dir = str(tmp_path / "reduced")
    rc = cli.main(["reduce_entities", "-s", ds_dir, "-d", red_dir, "-n", "2"])
    assert rc == 0
    red = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert red["n_rows"] == 5 and red["n_invalid"] == 0
    assert isinstance(red["rules"], dict)

    rc = cli.main(["show_statistics", "-s", red_dir])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [r["language"] for r in rep["languages"]] == ["english"]
    assert rep["languages"][0]["n_records"] == 5
    assert len(rep["entities"]["english"]) >= 1
