#!/usr/bin/env python3
"""Diff two Bench JSON lines (e.g. BENCH_r1.json vs a local run): per-query
delta sorted by regression, flagging anything >1.5x slower.

Usage: bench_compare.py OLD.json NEW.json
"""
import json
import sys


def load(p):
    with open(p) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    raise SystemExit(f"no JSON line in {p}")


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    oq, nq = old["queries"], new["queries"]
    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({new['value'] / old['value']:.2f}x)")
    rows = []
    for k in sorted(set(oq) | set(nq)):
        o, n = oq.get(k), nq.get(k)
        if o is None or n is None:
            rows.append((float("inf"), f"  {'added' if o is None else 'removed':>8}  {k}"))
        elif o > 0:
            rows.append((n / o, f"{n / o:8.2f}x  {o:6.2f} -> {n:6.2f}  {k}"
                         + ("   <-- REGRESSION" if n / o > 1.5 and n > 1 else "")))
    for _, line in sorted(rows, key=lambda r: -r[0]):
        print(line)


if __name__ == "__main__":
    main()
