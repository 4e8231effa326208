#!/usr/bin/env python3
"""Build the BASELINE.md sf1 scale-validation table (driver-side
tooling only): graft sf0.1 vs sf1 (10x data) per query, with the
DuckDB sf1 baseline where it completed.

Usage:
  python3 tools/scale_table.py <bench_sf0.1.json> <bench_sf1.json> \
      [baseline_sf1.json] [query ...]

With no query list, prints every query in the sf1 bench sorted by
sf1 time descending. The `scale` column is t(sf1)/t(sf0.1) on 10x
data — linear kernels with amortized job floors should land well
under 10.
"""
import sys, json


def main():
    b01 = json.load(open(sys.argv[1]))["queries"]
    b1 = json.load(open(sys.argv[2]))["queries"]
    base = {}
    timeout = None
    rest = sys.argv[3:]
    if rest and rest[0].endswith(".json"):
        d = json.load(open(rest[0]))
        timeout = d.get("timeout_sec")
        for name, sec in d["queries"].items():
            key = name
            base[key] = (sec, d["status"][name])
        rest = rest[1:]
    names = rest or sorted(b1, key=lambda n: -b1[n])
    print("| query | graft sf0.1 (s) | graft sf1 (s) | scale (10x data) | DuckDB sf1 (s) | graft/DuckDB sf1 |")
    print("|---|---|---|---|---|---|")
    for n in names:
        t1 = b1.get(n)
        t01 = b01.get(n)
        if t1 is None:
            continue
        ratio = f"{t1 / t01:.1f}x" if t01 else "—"
        bn = next((v for k, v in base.items() if k == n or k.startswith(n)), None)
        if bn is None:
            dk, rr = "—", "—"
        elif bn[1] != "ok":
            dk, rr = f">{timeout:.0f} (timeout)", "<<1"
        else:
            dk = f"{bn[0]:.2f}"
            rr = f"{t1 / bn[0]:.2f}"
        print(f"| {n} | {t01:.2f} | {t1:.2f} | {ratio} | {dk} | {rr} |")


if __name__ == "__main__":
    main()
