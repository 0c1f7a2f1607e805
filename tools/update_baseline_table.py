#!/usr/bin/env python3
"""Regenerate the per-query medians table at the bottom of BASELINE.md
from a bench_full.json pin, and print summary stats (total, shared-query
comparison vs a previous pin) for the prose section.

Usage: python3 tools/update_baseline_table.py <new_pin.json> [old_pin.json]
Prints the table to stdout plus a '== stats ==' footer; the caller
splices it into BASELINE.md.
"""
import sys, json

new = json.load(open(sys.argv[1]))
old = json.load(open(sys.argv[2])) if len(sys.argv) > 2 else None

q = new["queries"]
print(f"## Per-query medians (sf0.1, seconds, descending — all {len(q)})")
print()
print("| query | sec |")
print("|---|---|")
for name, sec in sorted(q.items(), key=lambda kv: -kv[1]):
    print(f"| {name} | {sec:.3f} |")

print()
print("== stats ==")
print(f"total {new['total']:.2f} s / {len(q)} queries; errors {new.get('errors')}")
if old:
    oq = old["queries"]
    shared = sorted(set(q) & set(oq))
    s_new = sum(q[k] for k in shared)
    s_old = sum(oq[k] for k in shared)
    print(f"shared {len(shared)} queries: {s_new:.2f} s now vs {s_old:.2f} s prior "
          f"({(s_new / s_old - 1) * 100:+.1f}%)")
    regressed = sorted(((k, q[k] / oq[k]) for k in shared if oq[k] > 0.05),
                       key=lambda kv: -kv[1])[:5]
    print("worst shared ratios:",
          ", ".join(f"{k} {oq[k]:.2f}->{q[k]:.2f} x{r:.2f}" for k, r in regressed))
    new_qs = sorted(set(q) - set(oq), key=lambda k: -q[k])
    print("new queries:", ", ".join(f"{k} {q[k]:.3f}" for k in new_qs))
