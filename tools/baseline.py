#!/usr/bin/env python3
"""Time the DuckDB oracle queries against an sf dir — produces the
numbers behind BASELINE.md (driver-side tooling only, like check.py).

Usage: python3 tools/baseline.py <sfdir> <oracle_sql.json> [out.json] [timeout_sec]

Each query runs in its own subprocess with a hard wall-clock timeout
(default 300 s) so the naive O(n^2) oracle formulations (exhaustive
pairwise Jaccard / cosine — DuckDB has no LSH path) can't stall the
sweep; timed-out queries report null with "timeout" status.
"""
import sys, json, time, subprocess

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

WORKER = r"""
import sys, json, time
import duckdb
sfdir = sys.argv[1]
sql = sys.stdin.read()
con = duckdb.connect()
import os
for t in %s:
    src = f"{sfdir}/{t}.parquet"
    if os.path.isdir(src):  # multi-part dataset (GenScale output)
        src += "/*.parquet"
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
t0 = time.time()
con.sql(sql).fetchall()
print(json.dumps({"sec": round(time.time() - t0, 3)}))
""" % repr(TABLES)


def main():
    sfdir, oracle_path = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    timeout = float(sys.argv[4]) if len(sys.argv) > 4 else 300.0
    oracle = json.load(open(oracle_path))
    times, status = {}, {}
    for name in sorted(oracle):
        try:
            r = subprocess.run(
                [sys.executable, "-c", WORKER, sfdir],
                input=oracle[name], capture_output=True, text=True,
                timeout=timeout)
            out_lines = r.stdout.strip().splitlines()
            if r.returncode == 0 and out_lines:
                # last stdout line is the timing JSON (duckdb may emit
                # warnings/progress on stdout before it)
                times[name] = json.loads(out_lines[-1])["sec"]
                status[name] = "ok"
            else:
                times[name] = None
                status[name] = "error"
                print(f"ERR {name}: {r.stderr[-200:]}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            times[name] = None
            status[name] = f"timeout>{int(timeout)}s"
        print(f"{name}: {times[name]} [{status[name]}]", flush=True)
    total_ok = round(sum(v for v in times.values() if v is not None), 3)
    result = {"total_ok_sec": total_ok, "sf": sfdir,
              "timeout_sec": timeout,
              "n_timeout": sum(1 for s in status.values() if s.startswith("timeout")),
              "queries": times, "status": status}
    print(json.dumps(result))
    if out_path:
        json.dump(result, open(out_path, "w"), indent=1)


if __name__ == "__main__":
    main()
