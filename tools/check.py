#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query parquet in <outDir>, executes the matching oracle SQL
(from <outDir>/oracle_sql.json) in DuckDB over the same sf tables and
compares — columns sorted by name, rows sorted, exact value match
(tiny float tolerance reported separately so we can see how close we
are to hash-exact).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"create view {name} as select * from '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, exact, close, noora = [], [], [], []

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

for qdir in sorted(glob.glob(f"{out_dir}/*/")):
    q = qdir.rstrip("/").split("/")[-1]
    try:
        got = pd.read_parquet(qdir)
    except Exception as e:
        fails.append((q, f"read fail: {e}")); continue
    if q not in oracle:
        noora.append((q, len(got))); continue
    try:
        exp = con.sql(oracle[q]).df()
    except Exception as e:
        fails.append((q, f"oracle fail: {e}")); continue
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        fails.append((q, f"cols {list(g.columns)} vs {list(e.columns)}")); continue
    if len(g) != len(e):
        fails.append((q, f"rows {len(g)} vs {len(e)}")); continue
    diffs = []
    for c in g.columns:
        gv, ev = g[c], e[c]
        # the driver hashes raw values: int 21 vs float 21.0 differ. Flag
        # numeric-kind mismatches instead of silently coercing both to float.
        if gv.dtype.kind != ev.dtype.kind and {gv.dtype.kind, ev.dtype.kind} & {'f'}:
            diffs.append((c, f"dtype {gv.dtype} vs {ev.dtype}", None))
            continue
        if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
            gv = gv.astype(float); ev = ev.astype(float)
            both_nan = gv.isna() & ev.isna()
            eq = (gv == ev) | both_nan
            if not eq.all():
                m = (~eq)
                maxd = np.nanmax(np.abs(gv[m].values - ev[m].values))
                diffs.append((c, int(m.sum()), maxd))
        else:
            gv = gv.astype(str); ev = ev.astype(str)
            if not (gv == ev).all():
                diffs.append((c, int((gv != ev).sum()), None))
    if not diffs:
        exact.append((q, len(g)))
    else:
        small = all(d[2] is not None and d[2] < 1e-9 for d in diffs)
        (close if small else fails).append((q, diffs))

print(f"EXACT ({len(exact)}):")
for q, n in exact: print(f"  {q}: {n} rows")
print(f"CLOSE-not-exact ({len(close)}):")
for q, d in close: print(f"  {q}: {d}")
print(f"NO-ORACLE rows-only ({len(noora)}):")
for q, n in noora: print(f"  {q}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
print(f"FAIL ({len(fails)}):")
for q, d in fails: print(f"  {q}: {d}")
sys.exit(1 if fails else 0)
