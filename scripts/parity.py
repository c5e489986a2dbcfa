#!/usr/bin/env python3
"""Dev-loop parity harness: replicate the driver's CORRECTNESS check for a
subset of queries without waiting for a round.

Usage: python scripts/parity.py [--sf DIR] [query ...]
With no query names, runs every query that has an oracle_sql entry.

Comparison mirrors the driver contract: sort columns by name, sort rows,
compare row count, column-name schema, and a value hash (values rendered
via repr of Python objects after both engines' results pass through
pandas). Floats are rounded to 9 significant digits before hashing, the
usual tolerance for cross-engine float formatting.

The check is also TYPE-sensitive (round-4 hardening): the driver hashes
pandas frames, where DuckDB HUGEINT (bare ``sum(BIGINT)``) becomes
float64 and mismatches Spark's int64 even when the values stringify
identically — exactly the failure mode of the 5 CORRECTNESS_r03 reds.
Each query's oracle is DESCRIBEd and its output types compared to the
Spark schema via scripts/oracle_type_lint.py; a type error fails parity.
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(v) -> str:
    import datetime as _dt

    if v is None:
        return "NULL"
    if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
        return f"{v} 00:00:00"  # DuckDB DATE vs Spark midnight TIMESTAMP
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _frame_sig(rows: list[tuple], cols: list[str]) -> tuple[int, list[str], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        tuple(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for r in canon_rows:
        h.update("\x01".join(r).encode())
        h.update(b"\x02")
    return len(rows), sorted(cols), h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as E
    from pyspark_datacol_diff_spark.session import get_spark

    spark = get_spark()
    qs, sqls = E.queries(), E.oracle_sql()
    names = args.names or [n for n in qs if n in sqls]

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    from oracle_type_lint import lint_one

    failed = []
    for name in names:
        if name not in sqls:
            print(f"{name}: SKIP (no oracle)")
            continue
        sdf = qs[name](spark, args.sf)
        s_rows = [tuple(r) for r in sdf.collect()]
        s_sig = _frame_sig(s_rows, sdf.columns)
        res = con.execute(sqls[name])
        o_cols = [d[0] for d in res.description]
        o_sig = _frame_sig([tuple(r) for r in res.fetchall()], o_cols)
        type_errs = lint_one(con, spark, args.sf, name, sqls[name], sdf)[
            "errors"
        ]
        ok = s_sig == o_sig and not type_errs
        marks = (
            f"rows {s_sig[0]}/{o_sig[0]} "
            f"schema {'ok' if s_sig[1] == o_sig[1] else 'MISMATCH'} "
            f"hash {'ok' if s_sig[2] == o_sig[2] else 'MISMATCH'} "
            f"types {'ok' if not type_errs else 'MISMATCH'}"
        )
        print(f"{name}: {'PASS' if ok else 'FAIL'} ({marks})")
        if not ok:
            failed.append(name)
            if s_sig[1] != o_sig[1]:
                print(f"  spark cols:  {s_sig[1]}")
                print(f"  oracle cols: {o_sig[1]}")
            for e in type_errs:
                print(f"  type: {e}")
    print(f"\n{len(names) - len(failed)}/{len(names)} pass")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
