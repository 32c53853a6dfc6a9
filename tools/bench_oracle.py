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
import json, sys, glob, os, time, statistics

import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
out_json = sys.argv[3] if len(sys.argv) > 3 else "BENCH_ORACLE.json"
reps = 3

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
queries, failed = {}, {}
for name, sql in sorted(oracle.items()):
    try:
        con.execute(sql).fetchall()  # warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times.append(time.perf_counter() - t0)
        queries[name] = statistics.median(times)
        print(f"{name:24s} {queries[name]:8.3f} s")
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
