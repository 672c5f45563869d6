#!/usr/bin/env python3
"""Scale-curvature report: per-query time ratio between two BENCH_full
artifacts measured back-to-back in the same host window (sf0.1 vs sf1 —
10x rows in every fact table, so 10x is the linear reference for
corpus-bound queries; fixture/dimension-bound queries sit near 1x).

Flags queries whose ratio exceeds the super-linear threshold (default
15 = 1.5 x linear) AND whose absolute sf1 cost is non-trivial — those
are the rows that need a PLANS.md audit (unless their OUTPUT grew
super-linearly, which the audit records).

Usage: curve.py SF01.json SF1.json [threshold=15] [min_sf1_sec=0.5]
"""
import json
import sys


def main() -> None:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
    min_s = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5
    qa, qb = a["queries"], b["queries"]
    for tag, j in (("sf0.1", a), ("sf1", b)):
        m = j.get("meta") or {}
        print(f"{tag}: total {j['value']}s  load1 {m.get('load1_start')}->"
              f"{m.get('load1_end')}  steal {m.get('steal_pct')}%")
    shared = sorted(
        (k for k in qb if k in qa and qa[k] > 0.02),
        key=lambda k: -(qb[k] / qa[k]))
    flagged = [k for k in shared if qb[k] / qa[k] >= thr and qb[k] >= min_s]
    bands = {"<=2x (flat/fixed-floor)": 0, "2-10x (sublinear)": 0,
             "10-15x (~linear)": 0, f">={thr:g}x (SUPER-LINEAR)": 0}
    for k in shared:
        r = qb[k] / qa[k]
        if r <= 2: bands["<=2x (flat/fixed-floor)"] += 1
        elif r <= 10: bands["2-10x (sublinear)"] += 1
        elif r < thr: bands["10-15x (~linear)"] += 1
        else: bands[f">={thr:g}x (SUPER-LINEAR)"] += 1
    print(f"\nshared queries: {len(shared)}  (10x rows => 10x is linear)")
    for band, n in bands.items():
        print(f"  {band:28s} {n}")
    print("\ntop ratios (worst 25):")
    for k in shared[:25]:
        mark = "  <-- AUDIT" if k in flagged else ""
        print(f"  {k:32s} {qa[k]:7.2f}s -> {qb[k]:8.2f}s  "
              f"({qb[k] / qa[k]:5.1f}x){mark}")
    if flagged:
        print(f"\nAUDIT LIST ({len(flagged)} queries >= {thr:g}x and >= {min_s}s at sf1):")
        for k in flagged:
            print(f"  {k}")
    else:
        print(f"\nno query exceeds {thr:g}x with >= {min_s}s sf1 cost")


if __name__ == "__main__":
    main()
