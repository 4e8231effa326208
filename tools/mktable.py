#!/usr/bin/env python3
"""Regenerate BASELINE.md's per-query table from a tools/baseline.py
dump and a graft.Bench JSON line (driver-side tooling only).

Usage: python3 tools/mktable.py <baseline_full.json> <bench.json>

Prints the markdown table (oracle-checked queries, DuckDB vs Spark)
followed by the rows-only listing; paste over the existing section.
Bench keys are short prefixes; full names come from the baseline dump.
"""
import sys, json


def main():
    base = json.load(open(sys.argv[1]))
    bench = json.load(open(sys.argv[2]))
    spark = bench["queries"]

    def short(name):
        return name.split("_")[0]

    print("| query | DuckDB (s) | Spark (s) |")
    print("|---|---|---|")
    for name in sorted(base["queries"]):
        dk = base["queries"][name]
        status = base["status"][name]
        dk_s = f"{dk:.3f}" if status == "ok" else f">{base['timeout_sec']:.0f} (timeout)"
        sp = spark.get(short(name))
        sp_s = f"{sp:.2f}" if sp is not None else "—"
        print(f"| {name} | {dk_s} | {sp_s} |")
    rows_only = {
        k: v for k, v in spark.items()
        if k not in {short(n) for n in base["queries"]}
    }
    print()
    print("Rows-only queries (no oracle SQL, property-tested), Spark seconds:")
    print(", ".join(f"{k} {v:.2f}" for k, v in sorted(rows_only.items())) + ".")
    ok_total = base["total_ok_sec"]
    n_to = base["n_timeout"]
    floor = ok_total + n_to * base["timeout_sec"]
    print()
    print(f"DuckDB: {ok_total:.1f} s on {len(base['queries']) - n_to} completed "
          f"+ {n_to} x {base['timeout_sec']:.0f} s caps -> >= {floor:.1f} s floor. "
          f"Spark: {bench['value']:.1f} s on {bench['n_queries']} queries "
          f"({bench['n_failed']} failed).")


if __name__ == "__main__":
    main()
