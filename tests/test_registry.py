"""Registry-contract tests (round-4 VERDICT asks #2b and #7).

1. The driver grades EXACTLY the first 50 registry entries in insertion
   order (round-2 finding), so ``GRADED_ORDER`` must stay at 50 AND keep
   at least one representative per operator family — a rotation must
   never silently drop a family out of the graded window again.

2. DuckDB's ``sum(BIGINT)`` returns HUGEINT (int128). It survives
   ``fetchall()`` (plain Python int) but diverges in the driver's
   pandas/Arrow hashing path — this exact class caused all three
   round-3 hash-fails (kg_nodes, kg_split_rollup, evt_json_props). This
   test runs ``DESCRIBE SELECT`` over EVERY oracle in ``ALL_QUERIES``
   and asserts no driver-facing column is HUGEINT-typed. Oracles whose
   SQL references /tmp parquet that only a Spark run materializes are
   skipped here (visible, not silent) — ``tools/check_oracle.py``
   applies the same DESCRIBE guard to those after materialization.
"""

import duckdb
import pytest

from ontonotes_5_parsing_spark.operators.registry import (
    ALL_QUERIES,
    GRADED_ORDER,
)

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# every operator family that must keep at least one graded row
# (round-5: "pack_" = the webtext shard-packing family, its first
# graded representative)
FAMILIES = [
    "kg_", "media_", "txt_", "clean_", "dedup_", "ann_", "evt_",
    "win_", "rel_", "lineage_", "stream_", "pack_",
]


def test_graded_window_is_exactly_50():
    assert len(GRADED_ORDER) == 50
    assert len(set(GRADED_ORDER)) == 50


def test_graded_window_covers_every_family():
    for fam in FAMILIES:
        members = [n for n in GRADED_ORDER if n.startswith(fam)]
        assert members, f"family {fam!r} has no graded representative"


def test_graded_queries_all_registered():
    for name in GRADED_ORDER:
        assert name in ALL_QUERIES


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.mark.parametrize(
    "name", [n for n, (_fn, sql) in ALL_QUERIES.items() if sql is not None]
)
def test_oracle_emits_no_hugeint(con, name):
    _fn, sql = ALL_QUERIES[name]
    try:
        desc = con.execute(f"DESCRIBE SELECT * FROM ({sql}) _q").fetchall()
    except (duckdb.IOException, duckdb.CatalogException) as exc:
        pytest.skip(
            f"oracle input not materialized in this environment "
            f"(check_oracle.py applies the same guard post-run): {exc}"
        )
    bad = [
        (col, typ) for col, typ, *_ in desc
        if "HUGEINT" in typ.upper() or "INT128" in typ.upper()
    ]
    assert not bad, (
        f"{name}: HUGEINT driver-facing columns {bad} — wrap in "
        f"CAST(... AS BIGINT); the driver hash path renders int128 "
        f"differently than fetchall()"
    )
