#!/usr/bin/env python3
"""Local pre-validation mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir tables,
sorts columns by name, and compares cell-by-cell (exact).
"""
import json, math, sys
import duckdb
import pyarrow.parquet as pq
import pathlib

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple((k, norm(x)) for k, x in sorted(v.items()))
    return v

def table_rows(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    return cols, [tuple(norm(x[i]) for x in data) for i in range(tbl.num_rows)]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads((pathlib.Path(out_dir) / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got_cols, got = table_rows(pq.read_table(f"{out_dir}/{name}"))
            exp_cols, exp = table_rows(con.sql(sql).arrow())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_bad += 1
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_bad += 1
        elif sorted(got, key=repr) != sorted(exp, key=repr):
            diffs = [(g, e) for g, e in
                     zip(sorted(got, key=repr), sorted(exp, key=repr)) if g != e]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: {diffs[0]}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)

main()
