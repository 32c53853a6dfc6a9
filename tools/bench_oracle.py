#!/usr/bin/env python3
"""Per-query DuckDB timings of the oracle SQL suite — the measured baseline
the Spark bench is compared against (the reference publishes no numbers, so
the DuckDB oracle on identical queries + parquet is the only concrete
single-node comparator).

Usage: python3 tools/bench_oracle.py <sfDir> <verifyOutDir> [outJson]
<verifyOutDir> must contain oracle_sql.json (written by graft.Verify).
Each query is run once to warm (catalog, file cache) and `reps` times timed;
the per-query median lands in BENCH_ORACLE.json next to the repo root.
"""
import json, sys, glob, os, tempfile, time, statistics

import duckdb

# Queries whose Spark gate runs a DURABLE pipeline (graft.Main: read a
# dataset root, run the chain, write a sorted committed output root, read
# it back). Timing those against an in-memory SELECT is asymmetric (VERDICT
# r9 #1) — for a like-for-like ratio the oracle's timed region performs the
# same contract: COPY the query result TO parquet, then read it back.
# Correctness comparison still uses the plain SELECT (driver-side).
DURABLE = {"feature_pipeline"}

sf_dir, out_dir = sys.argv[1], sys.argv[2]
out_json = sys.argv[3] if len(sys.argv) > 3 else "BENCH_ORACLE.json"
reps = 3

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")


def run_query(con, name, sql):
    """One timed evaluation — durable-contract queries COPY TO parquet and
    read the file back; the rest fetch in memory."""
    if name in DURABLE:
        out = os.path.join(tempfile.gettempdir(), f"graft_oracle_{name}.parquet")
        con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        return con.execute(f"SELECT * FROM '{out}'").fetchall()
    return con.execute(sql).fetchall()


oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
queries, failed = {}, {}
for name, sql in sorted(oracle.items()):
    try:
        run_query(con, name, sql)  # warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run_query(con, name, sql)
            times.append(time.perf_counter() - t0)
        queries[name] = statistics.median(times)
        flag = " (durable: COPY TO parquet + read-back)" if name in DURABLE else ""
        print(f"{name:24s} {queries[name]:8.3f} s{flag}")
    except Exception as e:
        failed[name] = str(e).splitlines()[0]
        print(f"{name:24s}   FAILED {failed[name]}")

result = {
    "metric": "oracle_total",
    "value": sum(queries.values()),
    "unit": "sec",
    "engine": f"duckdb-{duckdb.__version__}",
    "reps": reps,
    "sf": sf_dir,
    "queries": queries,
    "failed": failed,
}
with open(out_json, "w") as f:
    json.dump(result, f, indent=1, sort_keys=True)
print(f"\ntotal {result['value']:.2f} s over {len(queries)} queries -> {out_json}")
