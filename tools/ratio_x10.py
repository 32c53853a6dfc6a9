#!/usr/bin/env python3
"""Join a graft.Bench JSON (Spark side) with a bench_scale.py log (DuckDB
side) into the per-query ratio table for the suite-level scale artifact.

Usage: python3 tools/ratio_x10.py <benchJson> <oracleLog> [ratioFloorSecs]

Queries whose oracle is a DNF (timeout / OOM kill) are listed separately —
a DNF denominator has no ratio. `ratioFloorSecs` (default 0.5) drops
sub-floor oracle times from the ">2x set" (job-floor noise, the
BENCH convention).
"""
import json, sys

bench = json.load(open(sys.argv[1]))["queries"]
floor = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
oracle, dnf = {}, []
for line in open(sys.argv[2]):
    parts = line.split()
    if len(parts) >= 4 and parts[0] in bench:
        if parts[2] == "DNF":
            dnf.append((parts[0], " ".join(parts[3:])))
        else:
            try:
                oracle[parts[0]] = float(parts[3])
            except ValueError:
                pass

rows = [(q, bench[q], oracle[q],
         bench[q] / oracle[q] if oracle[q] > 0 else float("inf"))
        for q in sorted(oracle)]
print(f"{'query':26s}{'spark':>8s}{'duckdb':>8s}{'ratio':>7s}")
for q, s, o, r in sorted(rows, key=lambda x: -x[3]):
    flag = " <floor" if o < floor else (" >2x" if r > 2 else "")
    print(f"{q:26s}{s:8.2f}{o:8.2f}{r:7.2f}{flag}")
# a 0.00s oracle time would yield an inf ratio yet contribute 0 to the
# denominator — exclude those rows from both totals; and when everything
# is a DNF (plausible at higher scales) the row set is empty: print n/a
# instead of dividing by zero.
finite = [(q, s, o, r) for q, s, o, r in rows if o > 0]
ts = sum(s for _, s, _, _ in finite)
to = sum(o for _, _, o, _ in finite)
ratio = f"{ts / to:.2f}x" if to > 0 else "n/a (zero oracle total)"
print(f"\ncomparable ({len(finite)} queries): spark {ts:.1f}s / duckdb {to:.1f}s"
      f" = {ratio}")
prop = [(q, s, o, r) for q, s, o, r in finite if o >= floor]
tsp = sum(s for _, s, _, _ in prop)
top = sum(o for _, _, o, _ in prop)
pratio = f"{tsp / top:.2f}x" if top > 0 else "n/a (empty/zero denominator)"
print(f"data-proportional (oracle >= {floor}s, {len(prop)} queries): "
      f"spark {tsp:.1f}s / duckdb {top:.1f}s = {pratio}")
over = [q for q, s, o, r in prop if r > 2]
print(f">2x set (oracle >= {floor}s): {over}")
print(f"oracle DNFs ({len(dnf)}): {dnf}")
