#!/usr/bin/env python3
"""Time the DuckDB oracle per query on a given sf dir (dev tool only —
the shipped Scala library has no Python dependency).

Each query runs in its own subprocess with a wall-clock timeout, so
quadratic oracle shapes (recursive-CTE components, all-pairs Jaccard)
can't wedge the whole recording; timed-out queries are reported as
{"timeout": limit}. Usage:

  python3 tools/bench_oracle.py <sf_dir> <oracle_sql.json> [timeout_sec] [out.json]
"""
import json, subprocess, sys, time

WORKER = r'''
import duckdb, os, sys, time
sf, sql = sys.argv[1], sys.stdin.read()
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.isdir(p):  # Spark-written table = directory of part files
        p = f"{p}/*.parquet"
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
t0 = time.monotonic()
con.sql(sql).fetchall()
print(time.monotonic() - t0)
'''

def main():
    sf = sys.argv[1]
    oracle = json.load(open(sys.argv[2]))
    limit = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
    out_path = sys.argv[4] if len(sys.argv) > 4 else None
    res, n_to = {}, 0
    for name in sorted(oracle):
        try:
            p = subprocess.run([sys.executable, "-c", WORKER, sf],
                               input=oracle[name], capture_output=True,
                               text=True, timeout=limit)
            out_lines = p.stdout.strip().splitlines()
            if p.returncode == 0 and out_lines:
                try:
                    res[name] = float(out_lines[-1])
                    print(f"{name}: {res[name]:.2f}s", flush=True)
                except ValueError:
                    res[name] = {"error": f"unparseable stdout: {out_lines[-1][:200]}"}
                    print(f"{name}: ERROR", flush=True)
            else:
                err = (p.stderr.strip().splitlines() or ["<no stderr>"])[-1]
                res[name] = {"error": err[:200]}
                print(f"{name}: ERROR", flush=True)
        except subprocess.TimeoutExpired:
            res[name] = {"timeout": limit}
            n_to += 1
            print(f"{name}: TIMEOUT >{limit}s", flush=True)
    done = [v for v in res.values() if isinstance(v, float)]
    summary = {"sf": sf, "timeout_sec": limit, "n": len(res),
               "n_timeout": n_to, "total_completed_sec": sum(done),
               "queries": res}
    if out_path:
        json.dump(summary, open(out_path, "w"), indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("sf", "n", "n_timeout", "total_completed_sec")}))

if __name__ == "__main__":
    main()
