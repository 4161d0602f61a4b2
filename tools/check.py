#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
with the sfDir parquet tables registered as views, load the Spark result
parquet, sort columns by name, sort rows, and compare cell-by-cell.
"""
import glob
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        # a declared oracle with no result dir means Verify never dumped
        # the query (planning failure or a GRAFT_ONLY restriction) — an
        # explicit FAIL line, never a silent omission / opaque IO error
        if not glob.glob(f"{out_dir}/{name}/*.parquet"):
            print(f"MISSING {name}: no result parquet under {out_dir}/{name} "
                  f"(query not dumped by Verify — planning failure or GRAFT_ONLY?)")
            n_fail += 1
            continue
        try:
            want = con.execute(sql).fetchdf()
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            wcols, gcols = sorted(want.columns), sorted(got.columns)
            if wcols != gcols:
                print(f"FAIL {name}: columns differ: oracle={wcols} got={gcols}")
                n_fail += 1
                continue
            # dtype drift (e.g. DuckDB HUGEINT -> float64 vs Spark int64)
            # is a FAILURE here (mirrors the driver, whose value-hash
            # includes the dtype) even when values compare equal below —
            # CAST-align the query or the oracle SQL.
            dt = [(c, str(want[c].dtype), str(got[c].dtype)) for c in wcols
                  if str(want[c].dtype) != str(got[c].dtype)]
            if dt:
                print(f"DTYPE {name}: {dt}")
                n_fail += 1
                continue
            w = sorted(tuple(norm(v) for v in r) for r in
                       want[wcols].itertuples(index=False, name=None))
            g = sorted(tuple(norm(v) for v in r) for r in
                       got[gcols].itertuples(index=False, name=None))
            if len(w) != len(g):
                print(f"FAIL {name}: rows differ: oracle={len(w)} got={len(g)}")
                n_fail += 1
                continue
            bad = [(a, b) for a, b in zip(w, g) if a != b]
            if bad:
                print(f"FAIL {name}: {len(bad)} mismatched rows; first: "
                      f"oracle={bad[0][0]} got={bad[0][1]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(w)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
