#!/usr/bin/env python3
"""Mechanical oracle output-type audit (VERDICT r3 demand #8).

Root cause it guards against: DuckDB types ``sum(BIGINT)`` (plain or
windowed) as HUGEINT (int128). The driver's value hash is type-sensitive
because HUGEINT converts to pandas float64 (``123`` -> ``123.0``) while
Spark's LONG stays int64 — so a query whose VALUES agree can still fail
the driver hash. This bit CORRECTNESS_r01 (`agg_event_stats`) and again
CORRECTNESS_r03 (5 queries). The fix is always the same one-liner:
``CAST(<emitted aggregate> AS BIGINT)``.

This lint makes the class mechanical: for every ``oracle_sql()`` entry it
runs DuckDB ``DESCRIBE`` (type inference only, no execution) against the
sf0.001 views, takes the matching Spark query's lazy schema, and flags:

- **error** ``hugeint``: any oracle output column typed HUGEINT/UHUGEINT
  (always wrong — pandas converts it to float64 or object).
- **error** ``kind_mismatch``: oracle column is float-family where Spark
  emits an integral type, or vice versa (``123`` vs ``123.0`` hashes
  differently).
- **warning** ``decimal_mismatch``: exactly one engine emits DECIMAL
  (DuckDB DECIMAL -> float64, Spark decimal -> object Decimal; risky but
  driver-green in some existing queries, so not auto-fatal).
- **error** ``missing_col`` / ``extra_col``: column-name set mismatch.

Usage: python scripts/oracle_type_lint.py [--sf DIR] [--out FILE.json]
Exit code 1 if any error. Also imported by tests/test_oracle_types.py so
``pytest`` fails locally on the same findings the driver would reject.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_DUCK_FLOAT = {"FLOAT", "REAL", "DOUBLE"}
_SPARK_INT = {"tinyint", "smallint", "int", "bigint"}
_SPARK_FLOAT = {"float", "double"}


def _family(t: str, spark: bool) -> str:
    """Collapse an engine type name to a hash-relevant family."""
    t = t.strip()
    if spark:
        base = t.lower()
        if base in _SPARK_INT:
            return "int"
        if base in _SPARK_FLOAT:
            return "float"
        if base.startswith("decimal"):
            return "decimal"
        return "other"
    base = t.upper()
    if "HUGEINT" in base:
        return "hugeint"
    if base in _DUCK_INT:
        return "int"
    if base in _DUCK_FLOAT:
        return "float"
    if base.startswith("DECIMAL"):
        return "decimal"
    return "other"


def make_duck(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def lint_one(con, spark, sf_dir: str, name: str, sql: str, qfn) -> dict:
    """Lint a single (query, oracle) pair; returns the findings record.

    ``qfn`` is either the query callable or an ALREADY-BUILT DataFrame
    (anything with ``.schema``) — callers that just executed the query
    (scripts/parity.py) pass the DataFrame so construction-time work
    (streaming replays, CC fixpoints, vocab/bitset collects) is not
    redone for a schema read."""
    errors: list[str] = []
    warnings: list[str] = []
    o_types = {
        r[0].lower(): r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()
    }
    sdf = qfn if hasattr(qfn, "schema") else qfn(spark, sf_dir)
    s_types = {
        f.name.lower(): f.dataType.simpleString() for f in sdf.schema.fields
    }
    for c in sorted(set(o_types) - set(s_types)):
        errors.append(f"extra_col: oracle-only column '{c}'")
    for c in sorted(set(s_types) - set(o_types)):
        errors.append(f"missing_col: spark-only column '{c}'")
    for c in sorted(set(o_types) & set(s_types)):
        of, sf = _family(o_types[c], False), _family(s_types[c], True)
        if of == "hugeint":
            errors.append(
                f"hugeint: '{c}' is {o_types[c]} in DuckDB (pandas float64) "
                f"vs Spark {s_types[c]} — wrap the oracle expr in "
                f"CAST(... AS BIGINT)"
            )
        elif {of, sf} == {"int", "float"}:
            errors.append(
                f"kind_mismatch: '{c}' DuckDB {o_types[c]} vs Spark "
                f"{s_types[c]} — 123 vs 123.0 hash differently"
            )
        elif ("decimal" in (of, sf)) and of != sf:
            warnings.append(
                f"decimal_mismatch: '{c}' DuckDB {o_types[c]} vs Spark "
                f"{s_types[c]}"
            )
    return {
        "oracle_types": o_types,
        "spark_types": s_types,
        "errors": errors,
        "warnings": warnings,
    }


def run_lint(sf_dir: str) -> dict:
    import __spark_entry__ as E
    from pyspark_datacol_diff_spark.session import get_spark

    spark = get_spark()
    con = make_duck(sf_dir)
    qs, sqls = E.queries(), E.oracle_sql()
    out: dict = {"sf_dir": sf_dir, "queries": {}}
    for name, sql in sqls.items():
        try:
            out["queries"][name] = lint_one(con, spark, sf_dir, name, sql, qs[name])
        except Exception as exc:  # a broken oracle is itself an error
            out["queries"][name] = {
                "errors": [f"lint_crash: {type(exc).__name__}: {exc}"],
                "warnings": [],
            }
    out["n_queries"] = len(out["queries"])
    out["n_errors"] = sum(len(q["errors"]) for q in out["queries"].values())
    out["n_warnings"] = sum(len(q["warnings"]) for q in out["queries"].values())
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    report = run_lint(args.sf)
    for name, rec in report["queries"].items():
        for e in rec["errors"]:
            print(f"ERROR {name}: {e}")
        for w in rec["warnings"]:
            print(f"warn  {name}: {w}")
    print(
        f"\n{report['n_queries']} oracles, {report['n_errors']} errors, "
        f"{report['n_warnings']} warnings"
    )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {args.out}")
    return 1 if report["n_errors"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
