"""bench.py contract: headline names resolve, entry module is coherent."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_module", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_headline_names_resolve():
    from ontonotes_5_parsing_spark.operators.registry import ALL_QUERIES

    bench = _load_bench()
    missing = [n for n in bench.HEADLINE if n not in ALL_QUERIES]
    assert missing == [], missing


def test_entry_exposes_graded_window():
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert len(qs) == 50
    # round-5: every graded query has an oracle (kg_triples gained a
    # relational DuckDB assembly of the fused triple stage)
    assert set(qs) - set(oracles) == set()
    # every oracle key is a query key (driver pairs them by name)
    assert set(oracles) <= set(qs)
