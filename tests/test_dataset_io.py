"""JSON dataset sink/source + validation (S4/S5) and statistics (A1/A2/A7)."""

from ontonotes_5_parsing_spark.pipeline.dataset_io import (
    read_json_dataset,
    route_splits,
    write_json_dataset,
)
from ontonotes_5_parsing_spark.pipeline.schemas import ANNOTATIONS_SCHEMA
from ontonotes_5_parsing_spark.pipeline.statistics import (
    entity_frequencies,
    language_frequencies,
    split_rollup,
)


def _ann_rows(n=40):
    rows = []
    for i in range(n):
        lang = ["english", "arabic", "chinese"][i % 3]
        rows.append(
            (f"https://x/{i}", 0, "Barack Obama visited Paris.", lang,
             {"PERSON": [(0, 12)], "GPE": [(21, 26)]})
        )
    return rows


def _ann_df(spark, rows=None):
    return spark.createDataFrame(rows or _ann_rows(), schema=ANNOTATIONS_SCHEMA)


def test_route_splits_disjoint_exhaustive(spark):
    routed = route_splits(_ann_df(spark)).collect()
    splits = {r.split for r in routed}
    assert splits <= {"train", "validation", "test"}
    assert len(routed) == 40
    # deterministic: same assignment on re-run
    routed2 = route_splits(_ann_df(spark)).collect()
    assert {(r.url, r.split) for r in routed} == {(r.url, r.split) for r in routed2}


def test_json_roundtrip_with_validation(spark, tmp_path):
    path = str(tmp_path / "dataset")
    write_json_dataset(_ann_df(spark), path)
    loaded, obs = read_json_dataset(spark, path)
    rows = loaded.collect()
    assert len(rows) == 40
    assert obs.get["n_rows"] == 40
    assert obs.get["n_invalid"] == 0
    r = rows[0]
    assert set(r["entities"].keys()) == {"PERSON", "GPE"}


def test_invalid_rows_filtered_and_counted(spark, tmp_path):
    rows = _ann_rows(10) + [
        ("https://bad/1", 0, "short", "english", {"PERSON": [(0, 99)]}),  # out of bounds
        ("https://bad/2", 0, "a  b", "english", {"GPE": [(1, 3)]}),  # blank span
        ("https://bad/3", 0, "   ", "english", {}),  # empty text
    ]
    path = str(tmp_path / "dataset_bad")
    write_json_dataset(_ann_df(spark, rows), path)
    loaded, obs = read_json_dataset(spark, path)
    assert loaded.count() == 10
    assert obs.get["n_rows"] == 13
    assert obs.get["n_invalid"] == 3


def test_statistics(spark):
    ann = route_splits(_ann_df(spark))
    lf = {r.language: r.n_records for r in language_frequencies(ann).collect()}
    assert sum(lf.values()) == 40 and set(lf) == {"english", "arabic", "chinese"}
    ef = {r.ent_type: r.n_spans for r in entity_frequencies(ann).collect()}
    assert ef == {"PERSON": 40, "GPE": 40}
    ef_en = entity_frequencies(ann, "english").collect()
    assert all(r.n_spans == 14 for r in ef_en)
    roll = split_rollup(ann).collect()
    totals = [r for r in roll if r.split is None]
    assert len(totals) == 1 and totals[0].n_spans == 80
