#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs graft.Verify at a given SF dir, then executes each oracle SQL in
DuckDB against the same parquet tables and compares: row count, column
names (sorted), and cell values (columns sorted by name, rows in result
order; floats compared exactly after the queries' own rounding).

Usage: python3 tools/verify_local.py [sfdir] [outdir] [--skip-spark]
"""
import json, math, subprocess, sys

args = [a for a in sys.argv[1:] if a != "--skip-spark"]
SFDIR = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
OUT = args[1] if len(args) > 1 else "/tmp/verify_out"
ONLY = args[2] if len(args) > 2 else None  # comma-separated query names
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

if "--skip-spark" not in sys.argv:
    filt = f" {ONLY}" if ONLY else ""
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SFDIR} {OUT}{filt}'],
        cwd="/root/repo", capture_output=True, text=True)
    tail = "\n".join((r.stdout + r.stderr).splitlines()[-30:])
    if r.returncode != 0:
        print(tail); sys.exit(1)
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line:
            print(line)

import duckdb
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SFDIR}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    return repr(v)

fails, passes = [], []
for name, sql in sorted(oracle.items()):
    try:
        got = con.sql(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')")
        gcols = sorted(got.columns)
        gd = con.sql(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").fetchall()
        gidx = [got.columns.index(c) for c in gcols]
        try:
            exp = con.sql(sql)
        except Exception as e:
            fails.append((name, f"oracle SQL error: {e}")); continue
        ecols = sorted(exp.columns)
        eidx = [exp.columns.index(c) for c in ecols]
        ed = exp.fetchall()
        if gcols != ecols:
            fails.append((name, f"columns differ: spark={gcols} duck={ecols}")); continue
        # schema (type) compare, mirroring the driver's schema match
        gtypes = dict(zip(got.columns, [str(t) for t in got.types]))
        etypes = dict(zip(exp.columns, [str(t) for t in exp.types]))
        tdiff = {c: (gtypes[c], etypes[c]) for c in gcols if gtypes[c] != etypes[c]}
        if tdiff:
            fails.append((name, f"types differ: {tdiff}")); continue
        if len(gd) != len(ed):
            fails.append((name, f"rowcount differ: spark={len(gd)} duck={len(ed)}")); continue
        bad = None
        for i, (gr, er) in enumerate(zip(gd, ed)):
            gs = [norm(gr[j]) for j in gidx]
            es = [norm(er[j]) for j in eidx]
            if gs != es:
                bad = (i, dict(zip(gcols, gs)), dict(zip(ecols, es))); break
        if bad:
            fails.append((name, f"row {bad[0]} differs:\n  spark={bad[1]}\n  duck ={bad[2]}"))
        else:
            passes.append((name, len(gd)))
    except Exception as e:
        fails.append((name, f"harness error: {e}"))

for n, c in passes: print(f"PASS {n} ({c} rows)")
for n, m in fails: print(f"FAIL {n}: {m}")
print(f"\n{len(passes)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
