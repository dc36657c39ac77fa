"""Local replica of the driver's correctness gate: run every
__spark_entry__ query on Spark and its oracle on DuckDB at sf0.01,
compare row count, column names, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [--sf-dir DIR] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, columns):
    """Sort columns by name, stringify values, sort rows → stable hash."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    def fmt(v):
        # v != v catches pandas NaN/NaT (the DuckDB side now arrives via
        # .df(), where SQL NULL becomes NaN) without importing pandas.
        if v is None or v != v:
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6f}".rstrip("0").rstrip(".")
        return str(v)
    lines = sorted(",".join(fmt(row[i]) for i in order) for row in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--all", action="store_true",
                    help="check registry.ALL_QUERIES, not just the driver-graded 50")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from ontonotes_5_parsing_spark.session import get_spark

    from ontonotes_5_parsing_spark.operators.kg import _ORACLE_SF

    if os.path.basename(args.sf_dir.rstrip("/")) != _ORACLE_SF:
        print(
            f"WARN  static /tmp-path oracles (kg_*, lineage_resume_pending) "
            f"embed the {_ORACLE_SF} materialization dir; at "
            f"--sf-dir {args.sf_dir} those comparisons are stale/invalid"
        )

    spark = get_spark(app_name="oracle_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    if args.all:
        from ontonotes_5_parsing_spark.operators.registry import ALL_QUERIES

        qs = {n: fn for n, (fn, _sql) in ALL_QUERIES.items()}
        oracles = {n: sql for n, (_fn, sql) in ALL_QUERIES.items()
                   if sql is not None}
    else:
        qs = entrymod.queries()
        oracles = entrymod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        # the driver canonicalizes with pandas sort_values over every
        # column — array/map/struct cells crash it (round-1 media bug),
        # EVEN on rows-only checks. Catch that class locally.
        complex_cols = [
            f.name for f in sdf.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if complex_cols:
            print(f"FAIL  {name}: complex-typed driver-facing columns "
                  f"{complex_cols} (driver canonicalizer cannot hash them)")
            n_fail += 1
            continue
        # paranoid float audit: the driver hash-failed two locally-green
        # queries in round 2 because DuckDB's round() over HUGEINT-derived
        # ratios differs in the driver's environment. Flag any float
        # column that is not classified in the provenance manifest, and
        # any SUM_ROUND/ITER_ROUND (engine-ordered double accumulation)
        # column inside the graded window that lacks a prior green row.
        from ontonotes_5_parsing_spark.operators.float_boundary import (
            FLOAT_PROVENANCE,
        )
        for f in sdf.schema.fields:
            st = f.dataType.simpleString()
            if st == "float":
                print(f"WARN  {name}: float32 column {f.name} at the "
                      f"driver boundary (%.6f hash will flake)")
            elif st == "double" and (name, f.name) not in FLOAT_PROVENANCE:
                print(f"WARN  {name}: unclassified double column {f.name} "
                      f"(add provenance in operators/float_boundary.py)")
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only check) "
                  f"[{time.time()-t0:.1f}s]")
            if len(srows) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            # Round-3 judge finding: DuckDB sum(BIGINT) returns HUGEINT
            # (int128); fetchall() erases it (plain Python int) but the
            # driver's pandas/Arrow hash path renders it differently —
            # three locally-green queries hash-failed at the driver.
            # Defense (a): DESCRIBE the oracle and hard-fail on any
            # HUGEINT-typed driver-facing column.
            desc = con.execute(
                f"DESCRIBE SELECT * FROM ({oracles[name]}) _q"
            ).fetchall()
            bad_types = [
                (c, t) for c, t, *_ in desc
                if "HUGEINT" in t.upper() or "INT128" in t.upper()
            ]
            if bad_types:
                print(f"FAIL  {name}: oracle emits HUGEINT columns "
                      f"{bad_types} — CAST(... AS BIGINT) at the "
                      f"driver-facing boundary")
                n_fail += 1
                continue
            # Defense (b): fetch via .arrow(), NOT .df() — pandas coerces
            # nullable BIGINT and DECIMAL to float64 (round-4 ADVICE:
            # exactness lost above 2^53, '1.5' vs Decimal '1.50'), which
            # can fake both mismatches and passes the driver won't see.
            # Arrow preserves int64-with-NULLs (→ None), DECIMAL
            # (→ decimal.Decimal, same str() as Spark's), and DATE
            # (→ datetime.date, same str() as Spark's).
            dtbl = con.execute(oracles[name]).arrow()
            dcols = list(dtbl.column_names)
            drows = list(
                zip(*(dtbl.column(c).to_pylist() for c in dcols))
            ) if dcols else []
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns {sorted(scols)} != {sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} != {len(drows)}")
        if not problems:
            h1 = normalize(srows, scols)
            h2 = normalize(drows, dcols)
            if h1 != h2:
                problems.append("value-hash mismatch")
                sset = set(normalize([r], scols) for r in srows)
                dset = set(normalize([r], dcols) for r in drows)
                diff1 = [r for r in srows if normalize([r], scols) not in dset][:3]
                diff2 = [r for r in drows if normalize([r], dcols) not in sset][:3]
                problems.append(f"spark-only: {diff1}")
                problems.append(f"duck-only: {diff2}")
        if problems:
            n_fail += 1
            print(f"FAIL  {name}: " + "; ".join(str(p) for p in problems))
        else:
            print(f"OK    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
    spark.stop()
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
