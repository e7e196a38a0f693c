#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir]

Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` already ran (or run
with --run to invoke it). Loads each <outdir>/<name> parquet, runs the
matching oracle_sql.json entry in DuckDB over the same sf tables, sorts
columns by name and rows by all values, and compares cell-by-cell.
"""
import json, math, os, subprocess, sys

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

if "--run" in sys.argv:
    r = subprocess.run(["sbt", f'runMain graft.Verify {sfdir} {outdir}'],
                       capture_output=True, text=True, cwd="/root/repo")
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:]); sys.exit(1)

import duckdb
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], sorted(out)

ok = fail = 0
for name in sorted(oracle):
    path = f"{outdir}/{name}"
    if not os.path.isdir(path):
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        sr = con.execute(f"SELECT * FROM read_parquet('{path}/*.parquet')")
        scols, srows = sr.description, sr.fetchall()
        scols = [c[0] for c in scols]
        dr = con.execute(oracle[name])
        dcols = [c[0] for c in dr.description]
        drows = dr.fetchall()
    except Exception as e:
        print(f"FAIL {name}: exec error {str(e)[:300]}"); fail += 1; continue
    sc, srows_c = canon(scols, srows)
    dc, drows_c = canon(dcols, drows)
    if sc != dc:
        print(f"FAIL {name}: columns {sc} vs {dc}"); fail += 1; continue
    if len(srows_c) != len(drows_c):
        print(f"FAIL {name}: rows {len(srows_c)} vs {len(drows_c)}"); fail += 1; continue
    if srows_c != drows_c:
        diffs = [(a, b) for a, b in zip(srows_c, drows_c) if a != b][:3]
        print(f"FAIL {name}: value mismatch, first diffs: {diffs}"); fail += 1; continue
    print(f"OK   {name} ({len(srows_c)} rows)"); ok += 1

# queries without oracle entries → rows-only note
spark_outs = set(x for x in os.listdir(outdir) if os.path.isdir(f"{outdir}/{x}"))
for name in sorted(spark_outs - set(oracle)):
    print(f"NOTE {name}: no oracle (rows-only check)")
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
