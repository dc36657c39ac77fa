"""Float-provenance gate for the driver hash boundary (round-2 lesson).

Every float/double column any registry query emits must be classified
in ``operators/float_boundary.FLOAT_PROVENANCE`` with a class that
explains why it is cross-engine deterministic under the driver's
``%.6f`` value hash. A query growing an unclassified float column —
or, worse, a float32 — fails here before it can hash-flake at the
driver the way txt_repetition/evt_json_props did in round 2.

Schema inspection is plan-only (no jobs run) for most queries; the
kg_*/media_* oracle materializations and the streaming replay do run
small jobs at sf0.001, which the shared session handles in seconds.
"""

from __future__ import annotations

import pytest

from ontonotes_5_parsing_spark.operators.float_boundary import (
    ALLOWED_CLASSES,
    FLOAT_PROVENANCE,
    SUM_ROUND,
)
from ontonotes_5_parsing_spark.operators.registry import ALL_QUERIES, GRADED_ORDER

SF_DIR = "/root/testdata/sf0.001"


def _float_fields(df):
    out = []
    for f in df.schema.fields:
        s = f.dataType.simpleString()
        if s in ("float", "double"):
            out.append((f.name, s))
    return out


@pytest.fixture(scope="module")
def schemas(spark):
    got = {}
    for name, (fn, _sql) in ALL_QUERIES.items():
        got[name] = _float_fields(fn(spark, SF_DIR))
    return got


def test_no_float32_at_boundary(schemas):
    """float32 noise perturbs the 6th decimal of %.6f — ban it outright."""
    bad = [
        (q, col)
        for q, fields in schemas.items()
        for col, typ in fields
        if typ == "float"
    ]
    assert bad == [], f"float32 columns at the driver boundary: {bad}"


def test_every_float_column_classified(schemas):
    actual = {(q, col) for q, fields in schemas.items() for col, _ in fields}
    manifest = set(FLOAT_PROVENANCE)
    unclassified = actual - manifest
    stale = manifest - actual
    assert unclassified == set(), (
        f"float columns with no provenance class (add to float_boundary.py "
        f"with justification, or re-express as exact integers): {unclassified}"
    )
    assert stale == set(), f"manifest entries for columns that no longer exist: {stale}"


def test_classes_are_known():
    bad = {k: v for k, v in FLOAT_PROVENANCE.items() if v not in ALLOWED_CLASSES}
    assert bad == {}


def test_graded_window_sum_round_is_grandfathered_only():
    """SUM_ROUND (engine-ordered double accumulation) is admitted in the
    graded window only for columns that already have a driver-green row
    (rounds 1-2). New graded queries must use exact-integer boundaries.
    """
    grandfathered = {
        ("ann_label_norm_stats", "avg_norm"),
        ("evt_range_join", "total_value"),
        ("rel_pricing_summary", "sum_qty"),
        ("rel_pricing_summary", "sum_base_price"),
        ("rel_pricing_summary", "sum_disc_price"),
        ("rel_pricing_summary", "avg_qty"),
        ("rel_pricing_summary", "avg_disc"),
        ("rel_shipping_priority", "revenue"),
        ("rel_local_supplier_volume", "revenue"),
        ("rel_order_rollup", "total_price"),
    }
    graded = set(GRADED_ORDER)
    offenders = {
        (q, col)
        for (q, col), cls in FLOAT_PROVENANCE.items()
        if cls == SUM_ROUND and q in graded and (q, col) not in grandfathered
    }
    assert offenders == set(), (
        f"new SUM_ROUND columns in the graded window (use an integer-exact "
        f"boundary instead, cf. multimodal px_sum/sq_sum): {offenders}"
    )


def test_graded_window_shape():
    """The driver grades the first 50 registry entries in insertion
    order; the curated window must stay exactly 50 with the flagship
    families inside (round-2 verdict item #1)."""
    assert len(GRADED_ORDER) == 50
    assert len(set(GRADED_ORDER)) == 50
    kg = [q for q in GRADED_ORDER if q.startswith("kg_")]
    media = [q for q in GRADED_ORDER if q.startswith("media_")]
    # 10 since round 4: kg_merge_increment rotated in (VERDICT r3 #3)
    assert len(kg) == 10, kg
    assert len(media) == 4, media


def test_integer_division_truncates_identically_both_engines(spark):
    """Round-3 ADVICE worried the avg_k_milli boundary diverges on
    negative numerators because "Spark DIV truncates, DuckDB // floors".
    Measured, the premise is false: DuckDB's INTEGER // also truncates
    toward zero (-7 // 2 = -3, unlike Python's floor -4), so Spark DIV
    and DuckDB // agree for EVERY sign and no emulation is needed. Pin
    that agreement here so a DuckDB semantics change would surface."""
    import duckdb

    cases = [(-7, 2), (7, 2), (-8, 2), (0, 2), (-1, 3), (1, 3), (-9, 4)]
    df = spark.createDataFrame(cases, "n long, d long")
    got = {
        (r.n, r.d): r.q for r in df.selectExpr("n", "d", "n DIV d AS q").collect()
    }
    con = duckdb.connect()
    duck = {
        (n, d): q
        for n, d, q in con.execute(
            "SELECT n, d, n // d FROM (VALUES "
            + ", ".join(f"({n}, {d})" for n, d in cases)
            + ") t(n, d)"
        ).fetchall()
    }
    for n, d in cases:
        trunc = abs(n) // d * (1 if n >= 0 else -1)
        assert got[(n, d)] == duck[(n, d)] == trunc, (n, d, got[(n, d)], duck[(n, d)])
