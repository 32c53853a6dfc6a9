#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
Loads each <name>/ parquet written by graft.Verify, runs the matching SQL from
oracle_sql.json in DuckDB (tables = parquet files in sfDir), sorts columns by
name and rows by all columns, and diffs values.

TYPE-FAITHFUL (round 12): the driver's hash is computed over the typed values,
so this mimic must reject type drift that float-coercion used to mask:
  1. Any oracle column whose DuckDB declared type is HUGEINT/UHUGEINT/DECIMAL
     is a hard FAIL — DuckDB widens e.g. sum(BIGINT) to HUGEINT; the oracle
     SQL must CAST such columns explicitly (the r11 pq_topk/ivfpq_topk/pq_knn
     driver-hash failures were exactly this).
  2. An integer-kind column on one side vs a float-kind column on the other is
     a hard FAIL (1 vs 1.0 hashes differently in the driver).
Other representational kind differences (e.g. date32->object vs datetime64)
are value-compared as before but flagged with a NOTE so they're visible.
"""
import json, sys, glob, os
import duckdb
import numpy as np
import pandas as pd

WIDENED = ("HUGEINT", "UHUGEINT", "DECIMAL")

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")


def kind(dtype):
    """Collapse a pandas dtype to a comparison kind: i(nt), f(loat), b(ool),
    M (datetime), O (everything else: strings, lists, dates-as-object)."""
    k = dtype.kind
    if k in "iu":
        return "i"
    if k in "fc":
        return "f"
    return k


fails = []
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
for name, sql in sorted(oracle.items()):
    try:
        got = pd.read_parquet(f"{out_dir}/{name}")
    except Exception as e:
        fails.append((name, f"spark output missing: {e}"))
        continue
    try:
        rel = con.sql(sql)
        duck_types = dict(zip(rel.columns, [str(t).upper() for t in rel.types]))
        exp = rel.df()
    except Exception as e:
        fails.append((name, f"oracle sql error: {e}"))
        continue

    # 1. widened DuckDB declared types are a driver-hash divergence: hard fail
    widened = [f"{c}:{t}" for c, t in duck_types.items()
               if any(t.startswith(w) for w in WIDENED)]
    if widened:
        fails.append((name, f"oracle emits widened type(s) {widened} — add an "
                            f"explicit CAST in the oracle SQL (driver hash is "
                            f"type-faithful and will reject this)"))
        continue

    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"columns differ: spark={list(got.columns)} oracle={list(exp.columns)}"))
        continue

    # 2. int-vs-float kind drift is a driver-hash divergence: hard fail
    kind_fail = None
    for c in got.columns:
        gk, ek = kind(got[c].dtype), kind(exp[c].dtype)
        if gk != ek:
            if {gk, ek} == {"i", "f"}:
                kind_fail = (f"col {c}: dtype kind mismatch spark={got[c].dtype} "
                             f"oracle={exp[c].dtype} (duck type "
                             f"{duck_types.get(c)}) — int vs float hashes "
                             f"differently in the driver; align the types")
                break
            print(f"NOTE {name}: col {c} repr-kind differs "
                  f"(spark={got[c].dtype}, oracle={exp[c].dtype}); value-compared")
    if kind_fail:
        fails.append((name, kind_fail))
        continue

    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    if len(got) != len(exp):
        fails.append((name, f"row count: spark={len(got)} oracle={len(exp)}"))
        continue

    mismatch = None
    for c in got.columns:
        g, e = got[c], exp[c]
        try:
            if kind(g.dtype) == "f" and kind(e.dtype) == "f":
                ga, ea = g.astype(float).values, e.astype(float).values
                bad = np.where(np.isnan(ga) & np.isnan(ea), False, ga != ea)
                if bad.any():
                    i = int(np.argmax(bad))
                    mismatch = f"col {c} row {i}: spark={ga[i]} oracle={ea[i]}"
                    break
            else:
                ga = g.astype(object).where(pd.notna(g), None)
                ea = e.astype(object).where(pd.notna(e), None)
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
