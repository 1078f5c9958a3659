#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare graft.Verify
parquet dumps against the DuckDB oracle SQL, exact-match after sorting
columns by name and rows by value. Dev-only — not part of the library.

Usage: tools/check.py [sfdir] [verify_out]
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

ok = fail = 0
for d in sorted(glob.glob(f"{out}/*/")):
    name = os.path.basename(d.rstrip("/"))
    got = pd.read_parquet(d)
    if name not in oracle:
        print(f"[rows ] {name}: {len(got)} rows (no oracle)")
        continue
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"[ERR  ] {name}: oracle SQL failed: {e}")
        fail += 1
        continue
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        print(f"[FAIL ] {name}: columns {list(g.columns)} vs {list(e.columns)}")
        fail += 1
        continue
    if len(g) != len(e):
        print(f"[FAIL ] {name}: {len(g)} rows vs {len(e)}")
        fail += 1
        continue
    mismatch = None
    for c in g.columns:
        gv, ev = g[c].values, e[c].values
        if np.issubdtype(g[c].dtype, np.floating) or np.issubdtype(e[c].dtype, np.floating):
            gv64, ev64 = gv.astype(np.float64), ev.astype(np.float64)
            bad = ~((gv64 == ev64) | (np.isnan(gv64) & np.isnan(ev64)))
            if bad.any():
                i = int(np.argmax(bad))
                mx = float(np.nanmax(np.abs(gv64 - ev64)))
                mismatch = f"col {c} row {i}: {gv64[i]!r} vs {ev64[i]!r} (maxabsdiff {mx:.3e})"
                break
        else:
            bad = gv.astype(str) != ev.astype(str)
            if bad.any():
                i = int(np.argmax(bad))
                mismatch = f"col {c} row {i}: {gv[i]!r} vs {ev[i]!r}"
                break
    if mismatch:
        print(f"[FAIL ] {name}: {mismatch}")
        fail += 1
    else:
        print(f"[OK   ] {name}: {len(g)} rows exact-match")
        ok += 1
print(f"\n{ok} ok, {fail} fail, {len(oracle)} oracles")
sys.exit(1 if fail else 0)
