#!/usr/bin/env python3
"""Diff two bench sidecar files (bench_summary.json format: first line is
the full {"metric":"total",...,"queries":{...}} record). Usage:
  python3 tools/bench_diff.py BEFORE.json AFTER.json [top_n]
Prints per-query deltas sorted by absolute seconds saved, plus totals.
"""
import json, sys

def load(p):
    with open(p) as f:
        rec = json.loads(f.readline())
    return rec["queries"], rec["value"]

def main():
    before, tb = load(sys.argv[1])
    after, ta = load(sys.argv[2])
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    names = sorted(set(before) | set(after))
    rows = []
    for n in names:
        b, a = before.get(n), after.get(n)
        if b is None or a is None:
            rows.append((0.0, n, b, a))
        else:
            rows.append((b - a, n, b, a))
    rows.sort(key=lambda r: -abs(r[0]))
    print(f"total: {tb:.1f} -> {ta:.1f}  ({tb-ta:+.1f} s)")
    print(f"{'query':34s} {'before':>8s} {'after':>8s} {'delta':>8s} {'ratio':>6s}")
    for d, n, b, a in rows[:top]:
        bs = f"{b:8.2f}" if b is not None else "     new"
        as_ = f"{a:8.2f}" if a is not None else "    gone"
        rat = f"{a/b:6.2f}" if (b and a and b > 0) else "      "
        print(f"{n:34s} {bs} {as_} {d:+8.2f} {rat}")

if __name__ == "__main__":
    main()
