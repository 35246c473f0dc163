#!/usr/bin/env python3
"""Local pre-check mimicking the driver's t2 DuckDB-oracle compare.

Usage: python3 dev/verify_local.py [sfDir] [outDir]

Reads outDir/oracle_sql.json (written by graft.Verify), runs each SQL in
DuckDB against views over sfDir's parquet tables, and compares against the
Spark-written parquet in outDir/<name>/ — columns sorted by name, rows in
order, exact value equality (plus a string-repr warning for decimals).
"""
import duckdb, json, sys, glob, math
from decimal import Decimal

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

import os, time
oracle = json.load(open(f"{out}/oracle_sql.json"))
age = time.time() - os.path.getmtime(f"{out}/oracle_sql.json")
if age > 600:
    print(f"WARNING: oracle_sql.json is {age/60:.0f} min old — stale run?")
outdirs = {d for d in os.listdir(out) if os.path.isdir(f"{out}/{d}")}
no_oracle = sorted(outdirs - set(oracle))
if no_oracle:
    print(f"note: {len(no_oracle)} non-oracle outputs (rows-only check): {no_oracle}")
fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        cur = con.execute(sql)
        expcols = [d[0] for d in cur.description]
        exp = cur.fetchall()
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); fail += 1; continue
        cur2 = con.execute(f"SELECT * FROM read_parquet({files!r})")
        gotcols = [d[0] for d in cur2.description]
        got = cur2.fetchall()
        if sorted(expcols) != sorted(gotcols):
            print(f"FAIL {name}: cols spark={sorted(gotcols)} oracle={sorted(expcols)}")
            fail += 1; continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            fail += 1; continue
        ei = sorted(range(len(expcols)), key=lambda i: expcols[i])
        gi = sorted(range(len(gotcols)), key=lambda i: gotcols[i])
        bad = None
        for r, (er, gr) in enumerate(zip(exp, got)):
            for i, j in zip(ei, gi):
                a, b = er[i], gr[j]
                eq = (a == b) or (
                    isinstance(a, float) and isinstance(b, float)
                    and math.isnan(a) and math.isnan(b))
                if not eq:
                    bad = (r, expcols[i], a, b); break
                if isinstance(a, Decimal) and isinstance(b, Decimal) and str(a) != str(b):
                    print(f"warn {name}: row {r} col {expcols[i]} decimal-repr-differs spark={b} oracle={a}")
            if bad: break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[3]!r} oracle={bad[2]!r}")
            fail += 1
        else:
            print(f"ok   {name}: {len(got)} rows")
    except Exception as e:
        print(f"ERROR {name}: {e}"); fail += 1
print("RESULT:", "FAIL" if fail else "PASS", f"({len(oracle)} queries, {fail} failures)")
sys.exit(1 if fail else 0)
