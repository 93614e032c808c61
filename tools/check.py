#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (NOT shipped code).

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
    python3 tools/check.py <sfDir> <outDir>

Loads each <outDir>/<name> parquet (the Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same sf tables, and
compares: column names (sorted), row count, and values — BIT-EXACT for
doubles (struct.pack('<d')), because the driver hashes bits: round 9
shipped a +0.0 vs -0.0 divergence (q97) that `==` comparison was blind to
(0.0 == -0.0 is True). Rows are fetched via fetchall(), NOT pandas .df(),
so SQL NULL stays None and is distinguishable from float NaN (pandas float
columns collapse both to nan). Both-NaN counts as equal (engines may emit
different NaN payloads when writing); everything else must match bitwise.
Rows are compared as a multiset (sorted by stringified tuple), so queries
without a total ORDER BY don't spuriously fail.

Round-12 judge finding (the third checker-blind-spot): the driver's hash
is TYPE-sensitive but fetchall() erases integer width, so an un-cast
integer sum() in the oracle (DuckDB types it HUGEINT = int128, Spark
emits BIGINT) passed here while failing the driver. This checker now
also compares the DuckDB logical COLUMN TYPES of both relations (the
Spark parquet read vs the oracle SQL) and fails on ANY mismatch —
HUGEINT vs BIGINT, DECIMAL, INTEGER-width, anything. The local gate must
mirror the driver's semantics exactly: values AND types.
"""
import duckdb, json, math, struct, sys

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"


def cell_eq(x, y):
    if x is None or y is None:
        return x is y
    if isinstance(x, float) and isinstance(y, float):
        if math.isnan(x) and math.isnan(y):
            return True
        return struct.pack("<d", x) == struct.pack("<d", y)
    if isinstance(x, float) != isinstance(y, float):
        return False  # float vs non-float never matches the driver's hash
    return str(x) == str(y)


def fmt(x):
    if isinstance(x, float):
        s = repr(x)
        return s + ("" if math.copysign(1.0, x) > 0 or s.startswith("-") else " (-0.0)")
    return repr(x)


con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")


def compare(name, sql):
    """Returns the error list for one query (empty = bit-and-type exact)."""
    g_rel = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'")
    w_rel = con.sql(sql)
    g_cols, w_cols = list(g_rel.columns), list(w_rel.columns)
    g_order = sorted(range(len(g_cols)), key=lambda i: g_cols[i])
    w_order = sorted(range(len(w_cols)), key=lambda i: w_cols[i])
    got = [tuple(r[i] for i in g_order) for r in g_rel.fetchall()]
    want = [tuple(r[i] for i in w_order) for r in w_rel.fetchall()]
    g_types = [str(g_rel.types[i]) for i in g_order]
    w_types = [str(w_rel.types[i]) for i in w_order]
    g_cols = [g_cols[i] for i in g_order]
    w_cols = [w_cols[i] for i in w_order]
    errs = []
    if g_cols != w_cols:
        errs.append(f"columns: spark={g_cols} duck={w_cols}")
    elif g_types != w_types:
        diffs = [f"{c}: spark={gt} duck={wt}"
                 for c, gt, wt in zip(g_cols, g_types, w_types)
                 if gt != wt]
        errs.append(f"types: {'; '.join(diffs)}")
    elif len(got) != len(want):
        errs.append(f"rows: spark={len(got)} duck={len(want)}")
    else:
        key = lambda row: tuple(str(x) for x in row)
        got.sort(key=key)
        want.sort(key=key)
        bad_by_col = {}
        for i, (gr, wr) in enumerate(zip(got, want)):
            for j, (x, y) in enumerate(zip(gr, wr)):
                if not cell_eq(x, y):
                    bad_by_col.setdefault(g_cols[j], []).append(
                        (i, fmt(x), fmt(y)))
        for c, bad in bad_by_col.items():
            errs.append(f"col {c}: {len(bad)} diffs, first {bad[:3]}")
    return errs, len(got)


oracle = json.load(open(f"{out}/oracle_sql.json"))
n_pass = n_fail = 0
for name in sorted(oracle):
    try:
        errs, nrows = compare(name, oracle[name])
        if errs:
            n_fail += 1
            print(f"FAIL {name}")
            for e in errs:
                print(f"     {e}")
        else:
            n_pass += 1
            print(f"ok   {name} ({nrows} rows)")
    except Exception as e:
        n_fail += 1
        print(f"FAIL {name}: {type(e).__name__}: {e}")

if "--self-test" in sys.argv:
    # Driver-parity canary (r12 judge "done" criterion): the type check must
    # be alive. Take the first query whose result has a BIGINT column, read
    # the SAME parquet back through DuckDB with that one column widened to
    # HUGEINT — every VALUE is identical, so only the type comparison can
    # catch it. If this "passes", the gate is blind to the r12 failure class.
    canary = None
    for name in sorted(oracle):
        try:
            rel = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'")
        except Exception:
            continue
        for c, t in zip(rel.columns, rel.types):
            if str(t) == "BIGINT":
                canary = (name, c)
                break
        if canary:
            break
    if canary is None:
        print("SELF-TEST FAIL: no BIGINT column found to widen")
        n_fail += 1
    else:
        name, c = canary
        widened = (f'SELECT * REPLACE (CAST("{c}" AS HUGEINT) AS "{c}") '
                   f"FROM '{out}/{name}/*.parquet'")
        errs, _ = compare(name, widened)
        if any(e.startswith("types:") for e in errs):
            print(f"self-test ok: widening {name}.{c} to HUGEINT is caught")
        else:
            print(f"SELF-TEST FAIL: HUGEINT widening of {name}.{c} NOT "
                  f"caught (errs={errs}) — type check is dead")
            n_fail += 1

print(f"\n{n_pass} passed, {n_fail} failed")
sys.exit(1 if n_fail else 0)
