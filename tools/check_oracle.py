#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares against the
matching ``oracle_sql()`` via DuckDB: row count, schema (column name
set), and an order-insensitive value comparison (rows sorted, columns
sorted by name, floats rounded). Prints one line per query + a summary.

Usage: python tools/check_oracle.py [--sf-dir DIR] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 6)
                    if v == -0.0:
                        v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--staged",
        action="store_true",
        help="include post-window staged entries (queries_r5c.STAGED_QUERIES)",
    )
    args = ap.parse_args()

    import __spark_entry__ as e
    from linkgraph.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    if args.staged:
        # post-window staged entries (full driver window): same gate,
        # run locally — see queries_r5c.STAGED_QUERIES
        from linkgraph import queries_r5c as _r5c

        qs = {**qs, **_r5c.STAGED_QUERIES}
        oracles = {**oracles, **_r5c.STAGED_ORACLE_SQL}
    only = set(args.only.split(",")) if args.only else None
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, args.sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: schema {sorted(scols)} != {sorted(ocols)}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rows {len(srows)} != {len(orows)}")
            n_fail += 1
            continue
        a, b = _norm(srows, scols), _norm(orows, ocols)
        if a != b:
            diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
            msg = "; ".join(f"{a[i]} != {b[i]}" for i in diff)
            print(f"FAIL  {name}: values differ ({len([1 for x, y in zip(a, b) if x != y])} rows), e.g. {msg}")
            n_fail += 1
            continue
        print(f"PASS  {name}: {len(srows)} rows")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
