#!/usr/bin/env python3
"""Regenerate BASELINE.md's per-query medians table from a pinned
bench_full.json (the ALL_MEDIAN quiet-window protocol output).

Usage: python3 tools/regen_baseline_table.py BENCH_FULL_rN_pin.json
Prints the markdown table to stdout; the surrounding prose is edited
by hand.
"""
import json
import sys


def main() -> None:
    data = json.load(open(sys.argv[1]))
    q = data["queries"]
    rows = sorted(q.items(), key=lambda kv: -kv[1])
    print(f"| query | sec |")
    print(f"|---|---|")
    for name, sec in rows:
        print(f"| {name} | {sec:.3f} |")
    print(f"\ntotal: {data['total']:.2f} s / {len(rows)} queries; "
          f"env: {data.get('env')}")


if __name__ == "__main__":
    main()
