#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query parquet written by graft.Verify, runs the matching oracle
SQL (from oracle_sql.json) in DuckDB over views named after the fixture
tables, sorts columns by name and rows by all columns, and compares
values exactly. Exact match here implies the driver's hash compare
passes regardless of its canonicalization details.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cells_equal(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb
    except (TypeError, ValueError):
        pass
    return str(a) == str(b)


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            mine = canon(con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
            ref = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {str(e)[:200]}")
            n_fail += 1
            continue
        if list(mine.columns) != list(ref.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} != {list(ref.columns)}")
            n_fail += 1
            continue
        if len(mine) != len(ref):
            print(f"FAIL {name}: rows {len(mine)} != {len(ref)}")
            n_fail += 1
            continue
        bad = None
        for c in mine.columns:
            mv, rv = mine[c].tolist(), ref[c].tolist()
            for i, (x, y) in enumerate(zip(mv, rv)):
                if not cells_equal(x, y):
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: col={c} row={i} mine={x!r} oracle={y!r}")
            n_fail += 1
        else:
            dtypes_m = [str(t) for t in mine.dtypes]
            dtypes_r = [str(t) for t in ref.dtypes]
            note = "" if dtypes_m == dtypes_r else \
                f"  [dtype drift: {list(zip(mine.columns, dtypes_m, dtypes_r))}]"
            print(f"PASS {name} ({len(mine)} rows){note}")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {len(oracle)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    # optional 3rd arg: comma-separated query-name filter (local builder
    # iteration on a partial Verify dump; mirrors Verify's 3rd arg)
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
