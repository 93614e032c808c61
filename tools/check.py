#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (NOT shipped code).

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
    python3 tools/check.py <sfDir> <outDir>

Loads each <outDir>/<name> parquet (the Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same sf tables, and
compares: column names (sorted), row count, and values (exact, after
sorting columns by name, then sorting rows by all columns — i.e. a multiset
compare, so queries without a total ORDER BY don't spuriously fail).
"""
import duckdb, json, sys, math

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
n_pass = n_fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        got = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
        want = con.sql(sql).df()
        got = got[sorted(got.columns)].reset_index(drop=True)
        want = want[sorted(want.columns)].reset_index(drop=True)
        if list(got.columns) == list(want.columns) and len(got.columns):
            cols = list(got.columns)
            got = got.sort_values(cols, key=lambda s: s.astype(str)).reset_index(drop=True)
            want = want.sort_values(cols, key=lambda s: s.astype(str)).reset_index(drop=True)
        errs = []
        if list(got.columns) != list(want.columns):
            errs.append(f"columns: spark={list(got.columns)} duck={list(want.columns)}")
        elif len(got) != len(want):
            errs.append(f"rows: spark={len(got)} duck={len(want)}")
        else:
            for c in got.columns:
                a, b = got[c].tolist(), want[c].tolist()
                bad = []
                for i, (x, y) in enumerate(zip(a, b)):
                    if x is None and y is None:
                        continue
                    if isinstance(x, float) and isinstance(y, float):
                        if x == y or (math.isnan(x) and math.isnan(y)):
                            continue
                        bad.append((i, x, y))
                    elif str(x) != str(y):
                        bad.append((i, x, y))
                if bad:
                    errs.append(f"col {c}: {len(bad)} diffs, first {bad[:3]}")
        if errs:
            n_fail += 1
            print(f"FAIL {name}")
            for e in errs:
                print(f"     {e}")
        else:
            n_pass += 1
            print(f"ok   {name} ({len(got)} rows)")
    except Exception as e:
        n_fail += 1
        print(f"FAIL {name}: {type(e).__name__}: {e}")

print(f"\n{n_pass} passed, {n_fail} failed")
sys.exit(1 if n_fail else 0)
