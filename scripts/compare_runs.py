#!/usr/bin/env python3
"""Engine-vs-engine Verify output diff (the AQE/speculation sweep gate).

Usage: python3 scripts/compare_runs.py <baselineOutDir> <candidateOutDir>

Compares each query's Spark-written parquet between two Verify runs:
row count, column set, and an order-insensitive value hash (rows sorted
by every column, values stringified). A diff means the engine's output
depends on plan shape or task retries — the r8 GlobalRank bug class —
not on data. Exit code 1 on any diff or missing query.
"""
import glob
import os
import sys

import pandas as pd

base, cand = sys.argv[1], sys.argv[2]

def queries(d):
    return {os.path.basename(p) for p in glob.glob(f"{d}/*") if os.path.isdir(p)}

def canon_hash(d, name):
    df = pd.read_parquet(f"{d}/{name}")
    df = df[sorted(df.columns)]
    rows = df.astype(str).values.tolist()
    rows.sort()
    return len(rows), hash(tuple(map(tuple, rows)))

qb, qc = queries(base), queries(cand)
fails = []
if qb != qc:
    fails.append(f"query sets differ: only_base={sorted(qb - qc)} only_cand={sorted(qc - qb)}")
for name in sorted(qb & qc):
    try:
        nb, hb = canon_hash(base, name)
        nc, hc = canon_hash(cand, name)
    except Exception as e:
        fails.append(f"{name}: unreadable: {e}")
        continue
    if nb != nc:
        fails.append(f"{name}: row count {nb} vs {nc}")
    elif hb != hc:
        fails.append(f"{name}: value hash mismatch ({nb} rows)")
print(f"compared {len(qb & qc)} queries: {len(fails)} diffs")
for f in fails:
    print("DIFF", f)
sys.exit(1 if fails else 0)
