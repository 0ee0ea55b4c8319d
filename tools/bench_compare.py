#!/usr/bin/env python3
"""Compare two Bench full-artifact JSONs per key (driver-side tooling).

Usage: bench_compare.py OLD.json NEW.json [ratio_floor]
Prints keys whose NEW/OLD ratio falls outside [1/band, band] (default 2.0),
sorted by ratio, plus the totals — the PERF.md adjudication worklist.
"""
import json
import sys


def load(p):
    d = json.load(open(p))
    return d["value"], {k: v for k, v in d["queries"].items() if v > 0}


def main(old_p, new_p, band):
    to, qo = load(old_p)
    tn, qn = load(new_p)
    print(f"total: {to:.1f} -> {tn:.1f}  ({tn / to:.2f}x)")
    shared = sorted(set(qo) & set(qn))
    moved = []
    for k in shared:
        r = qn[k] / qo[k]
        if r > band or r < 1 / band:
            moved.append((r, k, qo[k], qn[k]))
    for r, k, a, b in sorted(moved):
        print(f"  {k}: {a:.2f} -> {b:.2f}  ({r:.2f}x)")
    only_old = set(qo) - set(qn)
    only_new = set(qn) - set(qo)
    if only_old:
        print("dropped keys:", sorted(only_old))
    if only_new:
        print("new keys:", sorted(only_new))
    if not moved:
        print(f"  (no shared key moved beyond {band}x)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 2.0)
