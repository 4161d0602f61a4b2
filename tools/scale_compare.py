#!/usr/bin/env python3
"""Compare two Bench total_detail JSON lines (e.g. sf0.1 vs derived sf1)
and flag superlinear queries.

Usage: python3 tools/scale_compare.py <base_detail.json> <big_detail.json> [ratio_flag]

A query is flagged when big_median / base_median exceeds ratio_flag
(default 10 — the data grew 10x, so >10x wall growth is superlinear
smell; scheduler-floor queries with tiny absolute times are exempt
below 0.5 s)."""
import json
import sys


def load(path):
    line = open(path).read()
    line = line[line.index('{'):]
    return json.loads(line)


def main(base_path, big_path, flag=10.0):
    base, big = load(base_path), load(big_path)
    bq, gq = base["queries"], big["queries"]
    rows = []
    for name in sorted(bq):
        if name not in gq:
            continue
        b, g = bq[name], gq[name]
        if b < 0 or g < 0:
            rows.append((float("inf"), name, b, g, "FAILED"))
            continue
        ratio = g / b if b > 0 else float("inf")
        mark = ""
        if ratio > flag and g >= 0.5:
            mark = "SUPERLINEAR?"
        rows.append((ratio, name, b, g, mark))
    rows.sort(reverse=True)
    print(f"{'query':40s} {'base_s':>8s} {'big_s':>8s} {'ratio':>7s}")
    for ratio, name, b, g, mark in rows[:25]:
        print(f"{name:40s} {b:8.3f} {g:8.3f} {ratio:7.2f} {mark}")
    flagged = [r for r in rows if r[4]]
    print(f"\ntotal base={base['value']:.1f}s big={big['value']:.1f}s "
          f"ratio={big['value']/base['value']:.2f}  flagged={len(flagged)}")
    for _, name, b, g, mark in flagged:
        print(f"  {mark} {name}: {b:.2f}s -> {g:.2f}s")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]) if len(sys.argv) > 3 else 10.0)
