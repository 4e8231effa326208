#!/usr/bin/env python3
"""Fold the round-14 family ladder runs (fam_<sf>_graft_r14*.txt +
fam_<sf>_duck_r14.json) into one markdown table for BASELINE.md.

Usage: python3 tools/fam_table.py [suffix]
"""
import json, re, sys, os

R = os.path.join(os.path.dirname(__file__), "runs")
SCALES = ["sf0.1", "sf1", "sf3", "sf10"]


def graft_times(sf, suffix=""):
    # prefer the "b" re-run (post closure-kernel) when present
    for cand in (f"fam_{sf}_graft_r14b.txt", f"fam_{sf}_graft_r14.txt"):
        p = os.path.join(R, cand)
        if os.path.exists(p):
            out = {}
            for line in open(p):
                m = re.match(r"(\S+)\s+min=([\d.]+)", line)
                if m:
                    out[m.group(1)] = float(m.group(2))
            return out, cand
    return {}, None


def duck_times(sf):
    p = os.path.join(R, f"fam_{sf}_duck_r14.json")
    if not os.path.exists(p):
        return {}, {}
    d = json.load(open(p))
    return d.get("queries", {}), d.get("status", {})


def main():
    gs = {sf: graft_times(sf) for sf in SCALES}
    ds = {sf: duck_times(sf) for sf in SCALES}
    names = sorted(gs["sf0.1"][0])
    hdr = "| query | " + " | ".join(
        f"{sf} graft / duck / ratio" for sf in SCALES) + " |"
    print(hdr)
    print("|" + "---|" * (len(SCALES) + 1))
    for n in names:
        cells = []
        for sf in SCALES:
            g = gs[sf][0].get(n)
            dq, st = ds[sf]
            d = dq.get(n)
            stat = st.get(n, "")
            if g is None:
                cells.append("—")
            elif d is None:
                cap = stat.replace("timeout>", "cap ") if stat else "n/a"
                cells.append(f"{g:.2f} / {cap} / **win**")
            else:
                cells.append(f"{g:.2f} / {d:.2f} / {g / d:.2f}x")
        print(f"| `{n}` | " + " | ".join(cells) + " |")
    for sf in SCALES:
        print(f"<!-- {sf}: graft source {gs[sf][1]} -->")


if __name__ == "__main__":
    main()
