#!/usr/bin/env python3
"""Driver-faithful local pre-check of the DuckDB-oracle compare.

Usage: python3 dev/verify_local.py [sfDir] [outDir] [--only q30,q33]

Mimics the driver's checker *representation-for-representation*:
  - Spark side:  pandas.read_parquet over outDir/<name>/ (pyarrow) —
    DECIMAL columns arrive as dtype object (Python Decimal), arrays as
    numpy.ndarray (which CRASH sort_values, like the driver's checker).
  - Oracle side: duckdb con.execute(sql).df() — DECIMAL arrives float64.
Columns sorted by name, rows sorted by all columns, then exact
cell-by-cell equality (NaN==NaN allowed). A hash of the sorted frame is
what the driver compares; exact per-cell equality is strictly stronger.

The round-1 lesson: the old version of this script read BOTH sides
through DuckDB, which normalized types the driver does not normalize —
so 34 locally-"green" queries failed at the driver. This version fails
exactly when the driver fails.
"""
import duckdb, json, sys, glob, math, os, time
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = None
_args = sys.argv[3:]
for i, a in enumerate(_args):
    if a.startswith("--only"):
        if "=" in a:
            only = set(a.split("=", 1)[1].split(","))
        elif i + 1 < len(_args):
            only = set(_args[i + 1].split(","))
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
age = time.time() - os.path.getmtime(f"{out}/oracle_sql.json")
if age > 600:
    print(f"WARNING: oracle_sql.json is {age/60:.0f} min old — stale run?")
outdirs = {d for d in os.listdir(out) if os.path.isdir(f"{out}/{d}")}
no_oracle = sorted(outdirs - set(oracle))

def load_spark(name):
    files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def canon(df):
    df = df[sorted(df.columns)]
    # Driver does sort_values over all columns; unhashable cells (ndarray)
    # raise here exactly like the driver's ERR rows.
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

import datetime
from decimal import Decimal

def normalize(exp, got):
    """Apply the representation tolerances CORRECTNESS_r02 PROVED the driver
    has (green rows with exactly these dtype splits):
      - int32 vs int64 (q13/q18/q19 green)  -> width-insensitive
      - datetime.date objects vs datetime64 (q26/q48/q57 green) -> unify
    Everything else stays strict; Decimal-object and ndarray cells remain
    driver-killers and are flagged by the caller."""
    for c in exp.columns:
        for df in (exp, got):
            v = first_non_null(df[c])
            if df[c].dtype == object and isinstance(v, datetime.date) \
               and not isinstance(v, datetime.datetime):
                # astype, NOT pd.to_datetime: to_datetime goes through
                # datetime64[ns], whose range is 1677..2262 — the temporal
                # axis (r18) legitimately emits year-1/9999 DATE cells,
                # which are exact in [us] on BOTH sides (duckdb .df()
                # already delivers DATE as datetime64[us]). Value-identical
                # to the old spelling for every in-range date; the r02
                # driver-proven tolerance (date objects vs datetime64) is
                # unchanged.
                df[c] = df[c].astype("datetime64[us]")
        if str(exp[c].dtype).startswith("datetime64") and str(got[c].dtype).startswith("datetime64"):
            exp[c] = exp[c].astype("datetime64[us]")
            got[c] = got[c].astype("datetime64[us]")
        if pd.api.types.is_integer_dtype(exp[c].dtype) and pd.api.types.is_integer_dtype(got[c].dtype):
            exp[c] = exp[c].astype("int64")
            got[c] = got[c].astype("int64")
    return exp, got

def first_non_null(col):
    """First non-null cell of a column, or None if all-null/empty. Sniffing
    iloc[0] alone misses a null-leading Decimal/ndarray driver-killer and
    skips date normalization on null-leading date columns."""
    nn = col.dropna() if col.dtype == object else col
    return nn.iloc[0] if len(nn) else None

def driver_killers(got):
    """Columns whose Spark-side representation is proven to break the
    driver: python Decimal objects (hash mismatch) or ndarray cells (ERR)."""
    bad = []
    for c in got.columns:
        if got[c].dtype == object:
            v = first_non_null(got[c])
            if isinstance(v, Decimal):
                bad.append((c, "Decimal"))
            elif isinstance(v, np.ndarray):
                bad.append((c, "ndarray"))
    return bad

def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    eq = a == b
    if isinstance(eq, np.ndarray):
        return bool(eq.all()) and len(np.atleast_1d(a)) == len(np.atleast_1d(b))
    return bool(eq)

fail = 0
names = sorted(oracle) if only is None else sorted(set(oracle) & only)
rows_only_checked = 0
# Rows-only check for non-oracle outputs (mimic the driver's weaker path):
for name in no_oracle:
    if only is not None and name not in only:
        continue
    rows_only_checked += 1
    try:
        df = load_spark(name)
        if df is None:
            print(f"FAIL {name}: no spark output"); fail += 1; continue
        canon(df)  # must not crash (arrays in output would)
        print(f"ok   {name}: rows-only, {len(df)} rows")
    except Exception as e:
        print(f"ERROR {name}: (rows-only) {type(e).__name__}: {e}")
        fail += 1
for name in names:
    sql = oracle[name]
    try:
        exp = con.execute(sql).df()
        got = load_spark(name)
        if got is None:
            print(f"FAIL {name}: no spark output"); fail += 1; continue
        if sorted(exp.columns) != sorted(got.columns):
            print(f"FAIL {name}: cols spark={sorted(got.columns)} oracle={sorted(exp.columns)}")
            fail += 1; continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            fail += 1; continue
        exp, got = canon(exp), canon(got)
        killers = driver_killers(got)
        if killers:
            print(f"FAIL {name}: driver-killer spark dtypes: {killers}")
            fail += 1; continue
        exp, got = normalize(exp, got)
        dt_mismatch = [(c, str(got[c].dtype), str(exp[c].dtype))
                       for c in exp.columns if str(got[c].dtype) != str(exp[c].dtype)]
        bad = None
        ncols = len(exp.columns)
        ev, gv = exp.to_numpy(dtype=object), got.to_numpy(dtype=object)
        for r in range(len(ev)):
            for c in range(ncols):
                if not cells_equal(ev[r, c], gv[r, c]):
                    bad = (r, exp.columns[c], ev[r, c], gv[r, c]); break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[3]!r} ({type(bad[3]).__name__}) oracle={bad[2]!r} ({type(bad[2]).__name__})")
            if dt_mismatch:
                print(f"     dtypes differ: {dt_mismatch}")
            fail += 1
        elif dt_mismatch:
            # Unproven-tolerance dtype split (not one of the r02-green kinds):
            # surface loudly but don't gate — the value compare above passed.
            print(f"warn {name}: values equal, unproven dtype split: {dt_mismatch}")
        else:
            print(f"ok   {name}: {len(got)} rows")
    except Exception as e:
        print(f"ERROR {name}: {type(e).__name__}: {e}"); fail += 1
print("RESULT:", "FAIL" if fail else "PASS",
      f"({len(names)} oracled + {rows_only_checked} rows-only, {fail} failures)")
sys.exit(1 if fail else 0)
