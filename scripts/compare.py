#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 scripts/compare.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, registers each <sfDir>/*.parquet as
a DuckDB view under its bare table name, runs each oracle SQL, and diffs
against the Spark-written parquet in <verifyOutDir>/<name>/. Reports
value mismatches exactly (no tolerance — the driver hashes) and dtype
differences as warnings.
"""
import duckdb, json, sys, glob, os
import numpy as np
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3:])

con = duckdb.connect()
for p in sorted(glob.glob(f"{sf}/*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
n_ok = n_fail = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    sql = oracle[name]
    try:
        dd = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}")
        n_fail += 1
        continue
    try:
        sd = pd.read_parquet(f"{out}/{name}")
    except Exception as e:
        print(f"FAIL {name}: spark output unreadable: {e}")
        n_fail += 1
        continue
    sc, dc = sorted(sd.columns), sorted(dd.columns)
    if sc != dc:
        print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
        n_fail += 1
        continue
    sd, dd = sd[sc], dd[sc]
    if len(sd) != len(dd):
        print(f"FAIL {name}: rowcount spark={len(sd)} duck={len(dd)}")
        n_fail += 1
        continue
    bad = False
    for c in sc:
        a, b = sd[c], dd[c]
        if str(a.dtype) != str(b.dtype):
            print(f"WARN {name}.{c}: dtype spark={a.dtype} duck={b.dtype}")
        av, bv = a.to_numpy(), b.to_numpy()
        if av.dtype.kind == "f" and bv.dtype.kind == "f":
            neq = ~((av == bv) | (np.isnan(av) & np.isnan(bv)))
        elif av.dtype.kind == "M" and bv.dtype.kind == "M":
            neq = ~((av == bv) | (np.isnat(av) & np.isnat(bv)))
        elif av.dtype.kind == "O" or bv.dtype.kind == "O":
            neq = np.array([x != y for x, y in zip(a.tolist(), b.tolist())])
        else:
            try:
                neq = av != bv
            except Exception:
                neq = np.array([x != y for x, y in zip(a.tolist(), b.tolist())])
        if neq.any():
            i = int(np.argmax(neq))
            print(f"FAIL {name}.{c}: {int(neq.sum())}/{len(a)} cells differ; "
                  f"first at row {i}: spark={a.iloc[i]!r} duck={b.iloc[i]!r}")
            bad = True
    if bad:
        n_fail += 1
    else:
        n_ok += 1
        print(f"OK   {name} ({len(sd)} rows, {len(sc)} cols)")

missing = [n for n in sorted(oracle) if not os.path.isdir(f"{out}/{n}")]
print(f"\n{n_ok} ok, {n_fail} fail" + (f", missing spark output: {missing}" if missing else ""))
sys.exit(1 if n_fail else 0)
