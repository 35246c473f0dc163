#!/usr/bin/env python3
"""Cell-by-cell comparison of two graft.Verify output trees.

Usage: python3 dev/compare_outputs.py OUT_A OUT_B

Mechanizes the parity certifications (16-vs-32-thread, codegen-off,
AQE-off, no-auto-broadcast): for every query directory present in
either tree, loads all parquet parts via pandas/pyarrow, sorts columns
by name and rows by all columns (object/array cells stringified first —
ndarray cells crash sort_values, same caveat as dev/verify_local.py),
then asserts exact cell equality with NaN==NaN allowed.

This is strictly stronger than the driver's hash compare: it reports
WHICH query and HOW MANY cells differ instead of a bare mismatch.
Exit 0 iff every query is byte-stable across the two runs.
"""
import sys, os, glob
import pandas as pd
import numpy as np

if len(sys.argv) != 3:
    print(__doc__)
    sys.exit(2)
a_root, b_root = sys.argv[1], sys.argv[2]

def load(root, name):
    files = sorted(glob.glob(f"{root}/{name}/*.parquet"))
    if not files:
        return None
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    df = df[sorted(df.columns)]
    # Stringify non-scalar / object cells so sort_values can't crash on
    # ndarray comparisons; equality on the stringified frame is still
    # exact because both sides pass through the identical rendering.
    for c in df.columns:
        if df[c].dtype == object or str(df[c].dtype) == "object":
            df[c] = df[c].map(lambda v: repr(v.tolist()) if isinstance(v, np.ndarray) else repr(v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

names_a = {d for d in os.listdir(a_root) if os.path.isdir(os.path.join(a_root, d))}
names_b = {d for d in os.listdir(b_root) if os.path.isdir(os.path.join(b_root, d))}
bad = []
for only, root in ((names_a - names_b, b_root), (names_b - names_a, a_root)):
    for n in sorted(only):
        bad.append((n, f"missing from {root}"))
for name in sorted(names_a & names_b):
    da, db = load(a_root, name), load(b_root, name)
    if da is None or db is None:
        bad.append((name, "empty output dir on one side"))
        continue
    if list(da.columns) != list(db.columns):
        bad.append((name, f"schema: {list(da.columns)} vs {list(db.columns)}"))
        continue
    if len(da) != len(db):
        bad.append((name, f"rows: {len(da)} vs {len(db)}"))
        continue
    # exact equality with NaN==NaN allowed
    neq = 0
    for c in da.columns:
        va, vb = da[c].values, db[c].values
        if va.dtype.kind == "f" and vb.dtype.kind == "f":
            neq += int((~((va == vb) | (np.isnan(va) & np.isnan(vb)))).sum())
        else:
            neq += int((pd.Series(va) != pd.Series(vb)).sum())
    if neq:
        bad.append((name, f"{neq} differing cells"))
    else:
        print(f"OK   {name}  ({len(da)} rows x {len(da.columns)} cols)")
for name, why in bad:
    print(f"DIFF {name}: {why}")
bad_shared = len({n for n, _ in bad} & names_a & names_b)
print(f"\n{len(names_a & names_b) - bad_shared} identical, {len(bad)} differing/missing")
sys.exit(1 if bad else 0)
