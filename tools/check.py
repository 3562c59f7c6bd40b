#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle. Usage:
    python3 tools/check.py [sfdir] [outdir] [--skip-verify]
Compares per query: row count, column names (sorted), and values (rows
sorted by all columns, columns sorted by name)."""
import sys, os, json, subprocess, glob

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    tail = (r.stdout + r.stderr).splitlines()
    for l in tail:
        if "[verify]" in l or "error" in l.lower():
            print(l)
    if r.returncode != 0:
        print("VERIFY RUN FAILED"); print("\n".join(tail[-30:])); sys.exit(1)

import duckdb, pandas as pd
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fail = 0
for name in sorted(oracle):
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        want = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    def norm(df):
        df = df[sorted(df.columns)]
        df = df.sort_values(by=list(df.columns), na_position="first")
        return df.reset_index(drop=True)
    g, w = norm(got), norm(want)
    if list(g.columns) != list(w.columns):
        print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}"); fail += 1; continue
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} != {len(w)}"); fail += 1; continue
    try:
        pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
        print(f"PASS {name} ({len(g)} rows)")
    except AssertionError as e:
        print(f"FAIL {name}: {str(e).splitlines()[-1] if str(e) else 'value mismatch'}")
        # show first differing rows
        neq = (g != w) & ~(g.isna() & w.isna())
        bad = neq.any(axis=1)
        if bad.any():
            i = bad.idxmax()
            print(f"  first diff row {i}:\n  got  {g.loc[i].to_dict()}\n  want {w.loc[i].to_dict()}")
        fail += 1
print(f"\n{'ALL GREEN' if fail == 0 else f'{fail} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fail else 0)
