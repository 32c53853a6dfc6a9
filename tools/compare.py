#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
Loads each <name>/ parquet written by graft.Verify, runs the matching SQL from
oracle_sql.json in DuckDB (tables = parquet files in sfDir), sorts columns by
name and rows by all columns, and diffs values.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        got = pd.read_parquet(f"{out_dir}/{name}")
    except Exception as e:
        fails.append((name, f"spark output missing: {e}"))
        continue
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f"oracle sql error: {e}"))
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"columns differ: spark={list(got.columns)} oracle={list(exp.columns)}"))
        continue
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    if len(got) != len(exp):
        fails.append((name, f"row count: spark={len(got)} oracle={len(exp)}"))
        continue
    # normalize dtypes for value comparison
    mismatch = None
    for c in got.columns:
        g, e = got[c], exp[c]
        try:
            if g.dtype.kind in "fc" or e.dtype.kind in "fc":
                import numpy as np
                ga, ea = g.astype(float).values, e.astype(float).values
                bad = ~((pd.isna(ga) & pd.isna(ea)) | (ga == ea))
                import numpy
                bad = numpy.where(numpy.isnan(ga) & numpy.isnan(ea), False, ga != ea)
                if bad.any():
                    i = int(numpy.argmax(bad))
                    mismatch = f"col {c} row {i}: spark={ga[i]} oracle={ea[i]}"
                    break
            else:
                ga, ea = g.astype(object).where(pd.notna(g), None), e.astype(object).where(pd.notna(e), None)
                neq = [i for i, (x, y) in enumerate(zip(ga, ea)) if x != y]
                if neq:
                    i = neq[0]
                    mismatch = f"col {c} row {i}: spark={ga[i]!r} oracle={ea[i]!r}"
                    break
        except Exception as ex:
            mismatch = f"col {c}: compare error {ex}"
            break
    if mismatch:
        fails.append((name, mismatch))
    else:
        print(f"OK   {name} ({len(got)} rows)")

for name, why in fails:
    print(f"FAIL {name}: {why}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} oracle queries match")
sys.exit(1 if fails else 0)
