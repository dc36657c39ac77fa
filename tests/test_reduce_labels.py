"""reduce_entities lifecycle parity (SURVEY.md §3.2)."""

from pyspark.sql import functions as F

from ontonotes_5_parsing_spark.kgref.distance import find_nearest_label
from ontonotes_5_parsing_spark.kgref.spans import insert_new_bounds
from ontonotes_5_parsing_spark.pipeline.reduce_labels import (
    apply_rules,
    build_rules,
    label_frequencies,
    reduce_labels,
)
from ontonotes_5_parsing_spark.pipeline.schemas import ANNOTATIONS_SCHEMA


def _ann_df(spark, rows):
    return spark.createDataFrame(rows, schema=ANNOTATIONS_SCHEMA)


def _rows(spark):
    return [
        ("u1", 0, "alpha beta gamma delta", "english",
         {"NP": [(0, 5)], "NP-SBJ": [(6, 10)], "VP": [(11, 16)]}),
        ("u1", 1, "alpha beta gamma delta", "english",
         {"NP": [(0, 5), (11, 16)], "NP-OBJ": [(6, 10)]}),
        ("u2", 0, "alpha beta gamma delta", "english",
         {"VP": [(0, 5)], "WHNP": [(6, 10)]}),
    ]


def test_label_frequencies(spark):
    freq = {
        r["label"]: r["freq"]
        for r in label_frequencies(_ann_df(spark, _rows(spark))).collect()
    }
    assert freq == {"NP": 3, "NP-SBJ": 1, "VP": 2, "NP-OBJ": 1, "WHNP": 1}


def test_build_rules_matches_reference_semantics(spark):
    freq = label_frequencies(_ann_df(spark, _rows(spark)))
    rules = build_rules(freq, n_seeds=2)
    # seeds by (freq desc, label): NP, VP; others -> nearest by
    # label_distance with first-match ties (reduce_entities.py:12-20)
    seeds = ["NP", "VP"]
    for label in ("NP-SBJ", "NP-OBJ", "WHNP"):
        expected_seed = seeds[find_nearest_label(label, seeds)]
        cluster = [k for k, v in rules.items() if v == rules[label]]
        assert expected_seed in cluster
    # canonical = min(len, label) within cluster
    assert rules["NP"] == "NP"
    assert rules["NP-SBJ"] == rules["NP"]


def test_apply_rules_merges_collisions_with_interval_union(spark):
    df = _ann_df(
        spark,
        [("u", 0, "aaaa bbbb cccc", "english",
          {"NP": [(0, 4)], "NP-X": [(3, 9)], "VP": [(10, 14)]})],
    )
    out = apply_rules(df, {"NP": "NP", "NP-X": "NP", "VP": "VP"}).collect()[0]
    ents = {k: [(s["start"], s["end"]) for s in v] for k, v in out["entities"].items()}
    # same result as the reference's insert_new_bounds on collision
    assert ents["NP"] == insert_new_bounds((3, 9), [(0, 4)])
    assert ents["VP"] == [(10, 14)]


def test_reduce_labels_end_to_end(spark):
    out, rules = reduce_labels(_ann_df(spark, _rows(spark)), n_seeds=2)
    labels_after = set()
    for r in out.collect():
        labels_after |= set(r["entities"].keys())
    assert labels_after == set(rules.values())
    assert len(labels_after) <= 2


def test_distance_exprs_match_kgref_elementwise(spark):
    """The Column-expression label distance must agree with
    kgref.distance.label_distance on vectors exercising every branch
    (equal / alpha-mismatch / empty-parts / joined-equal / prefix /
    shared-prefix / disjoint)."""
    from ontonotes_5_parsing_spark.kgref.distance import label_distance
    from ontonotes_5_parsing_spark.pipeline.reduce_labels import _distance_exprs

    labels = [
        "PERSON", "PERSON ", "ORG", "GPE", "NORP",
        "PV+PVSUFF_SUBJ:2MP", "PV", "PP-TMP", "SBAR-PRD", "VBD", "WRB",
        "DET+NOUN+CASE_DEF_GEN", "DET+NOUN+CASE_DEF_ACC",
        "...", "-=-", "", "  ", "a.b.c", "a.b", "a.b.d", "x-y-z",
        "123", "ABC-123", "+++", ":::", "A", "AB",
    ]
    pairs = [(a, b) for a in labels for b in labels]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = {
        (r.a, r.b): r.dist
        for r in _distance_exprs(df, "a", "b").collect()
    }
    for a, b in pairs:
        assert got[(a, b)] == label_distance(a, b), (a, b, got[(a, b)])


def test_build_rules_df_matches_driver_side(spark):
    """Relational rules == the collect-based build_rules on synthetic
    frequency tables that force non-seed assignment through every
    distance regime."""
    from ontonotes_5_parsing_spark.pipeline.reduce_labels import (
        build_rules,
        build_rules_df,
    )

    cases = [
        # (rows, n_seeds)
        ([("PERSON", 100), ("ORG", 90), ("GPE", 80), ("PERSON-X", 5),
          ("ORG+SUB", 4), ("GPEX", 3), ("QQ-ZZ", 2)], 3),
        ([("PV+PVSUFF_SUBJ:2MP", 50), ("PP-TMP", 40), ("SBAR-PRD", 30),
          ("PV", 20), ("VBD", 10), ("WRB", 5), ("DET+NOUN", 2)], 2),
        ([("A", 10)], 5),                       # fewer labels than seeds
        ([("B", 7), ("A", 7), ("C", 7)], 1),    # freq ties -> label order
    ]
    for rows, n in cases:
        freq = spark.createDataFrame(rows, "label string, freq long")
        expected = build_rules(freq, n_seeds=n)
        got = {
            r.label: r.canonical for r in build_rules_df(freq, n_seeds=n).collect()
        }
        assert got == expected, (rows, n, got, expected)


def test_duckdb_rules_sql_matches_driver_side():
    """The DuckDB oracle's distance ladder + shared-prefix fold must
    reproduce the kgref reference loop on adversarial label sets — the
    bench corpus's label set is seed-only, so this is the only place
    the SQL's distance branches are exercised."""
    import duckdb

    from ontonotes_5_parsing_spark.operators.kg import duckdb_label_rules_sql
    from ontonotes_5_parsing_spark.pipeline.reduce_labels import build_rules

    class _FakeFreq:
        """Minimal freq 'DataFrame' for build_rules (orderBy+collect)."""

        def __init__(self, rows):
            self.rows = rows

        def orderBy(self, *_):
            ordered = sorted(self.rows, key=lambda r: (-r[1], r[0]))
            return type(
                "C", (), {"collect": lambda _self: [
                    {"label": lbl, "freq": fq} for lbl, fq in ordered
                ]}
            )()

    cases = [
        ([("PERSON", 100), ("ORG", 90), ("GPE", 80), ("PERSON-X", 5),
          ("ORG+SUB", 4), ("GPEX", 3), ("QQ-ZZ", 2)], 3),
        ([("PV+PVSUFF_SUBJ:2MP", 50), ("PP-TMP", 40), ("SBAR-PRD", 30),
          ("PV", 20), ("VBD", 10), ("WRB", 5), ("DET+NOUN", 2)], 2),
        ([("A", 10)], 5),
        ([("B", 7), ("A", 7), ("C", 7)], 1),
        ([("PERSON", 9), ("123", 8), ("ABC-123", 3), ("456", 2),
          ("a.b.c", 1), ("a.b.d", 1)], 2),
    ]
    con = duckdb.connect()
    for rows, n in cases:
        expected = build_rules(_FakeFreq(rows), n_seeds=n)
        con.execute("DROP TABLE IF EXISTS lf")
        con.execute("CREATE TABLE lf(label VARCHAR, freq BIGINT)")
        con.executemany("INSERT INTO lf VALUES (?, ?)", rows)
        got = dict(con.execute(duckdb_label_rules_sql("lf", n)).fetchall())
        assert got == expected, (rows, n, got, expected)
