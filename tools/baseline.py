#!/usr/bin/env python3
"""Time the DuckDB oracle queries against an sf dir — produces the
numbers behind BASELINE.md (driver-side tooling only, like check.py).

Usage: python3 tools/baseline.py <sfdir> <oracle_sql.json> [out.json]

Runs each oracle query once after a warmup pass of the view catalog,
single connection, default DuckDB threading, and reports per-query
wall seconds plus the total.
"""
import sys, json, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir, oracle_path = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    # warmup: touch every table so OS page cache is equally warm
    for t in TABLES:
        con.execute(f"SELECT COUNT(*) FROM {t}").fetchall()
    oracle = json.load(open(oracle_path))
    times = {}
    for name in sorted(oracle):
        t0 = time.time()
        try:
            con.sql(oracle[name]).fetchall()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:
            times[name] = None
            print(f"ERR {name}: {e}", file=sys.stderr)
        print(f"{name}: {times[name]}s", flush=True)
    total = sum(v for v in times.values() if v is not None)
    result = {"total_sec": round(total, 3), "sf": sfdir, "queries": times}
    print(json.dumps(result))
    if out_path:
        json.dump(result, open(out_path, "w"), indent=1)


if __name__ == "__main__":
    main()
