#!/usr/bin/env python3
"""Emit the PERF.md scaling table from two graft.Bench JSON lines
(sf0.1 and sf1). Usage: scaling_table.py bench_sf01.json bench_sf1.json"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.read().strip())


def main(a, b):
    s01, s1 = load(a), load(b)
    q01, q1 = s01["queries"], s1["queries"]
    rows = []
    for k in sorted(q01):
        if k in q1 and q01[k] > 0:
            rows.append((k, q01[k], q1[k], q1[k] / q01[k]))
    rows.sort(key=lambda r: -r[3])
    print(f"| query | sf0.1 s | sf1 s | ratio (10x data) |")
    print("|---|---|---|---|")
    for k, t0, t1, r in rows:
        print(f"| {k} | {t0:.2f} | {t1:.2f} | {r:.1f}x |")
    print()
    print(f"totals: sf0.1 {s01['value']:.1f}s, sf1 {s1['value']:.1f}s, "
          f"ratio {s1['value']/s01['value']:.2f}x for 10x data")
    over = [k for k, _, _, r in rows if r > 15]
    print(f"queries over 15x: {over if over else 'none'}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
