#!/usr/bin/env python3
"""Times the DuckDB oracle SQL for a set of queries over an sf directory —
the oracle side of the engine-vs-oracle scale tables in BASELINE.md.
Each query runs in a fresh subprocess (min of 2 passes after a warm-up,
matching graft.Bench's estimator) under a wall timeout; a query that
cannot finish a single pass inside the timeout reports DNF.

Usage:
  python3 tools/bench_oracle.py <sfDir> <oracle_sql.json> [timeoutSec] [q1,q2,...]
"""
import json
import subprocess
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

WORKER = r"""
import json, os, sys, time
import duckdb
sf_dir, sql = sys.argv[1], sys.stdin.read()
con = duckdb.connect()
for t in %(tables)r:
    p = f"{sf_dir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
times = []
for i in range(3):  # pass 0 is the untimed warm-up
    t0 = time.time()
    con.execute(sql).fetchall()
    times.append(time.time() - t0)
print(json.dumps({"min_sec": min(times[1:]), "passes": times}))
"""


def main() -> None:
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else 300.0
    oracle = json.load(open(oracle_path))
    names = (sys.argv[4].split(",") if len(sys.argv) > 4
             else sorted(oracle.keys()))
    worker = WORKER % {"tables": TABLES}
    total = 0.0
    results = {}
    for name in names:
        sql = oracle.get(name)
        if sql is None:
            print(f"{name}: no oracle SQL", flush=True)
            continue
        t0 = time.time()
        try:
            out = subprocess.run(
                [sys.executable, "-c", worker, sf_dir], input=sql,
                capture_output=True, text=True, timeout=timeout)
            if out.returncode != 0:
                results[name] = None
                print(f"{name}: ERROR {out.stderr.strip()[:200]}", flush=True)
                continue
            r = json.loads(out.stdout.strip().splitlines()[-1])
            results[name] = r["min_sec"]
            total += r["min_sec"]
            print(f"{name}: {r['min_sec']:.3f} s "
                  f"(passes {[round(x, 3) for x in r['passes']]})", flush=True)
        except subprocess.TimeoutExpired:
            results[name] = None
            print(f"{name}: DNF (> {timeout:.0f} s wall for warm-up + 2 passes; "
                  f"killed at {time.time() - t0:.0f} s)", flush=True)
    done = [n for n, v in results.items() if v is not None]
    print(json.dumps({"total_sec_completed": round(total, 3),
                      "n_completed": len(done),
                      "n_dnf": len(results) - len(done),
                      "queries": {n: (round(v, 3) if v is not None else "DNF")
                                  for n, v in results.items()}}))


if __name__ == "__main__":
    main()
