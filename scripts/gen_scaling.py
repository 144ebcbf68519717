#!/usr/bin/env python3
"""Regenerate docs/SCALING.md from two bench_full.json runs.

Usage: python3 scripts/gen_scaling.py <bench_full_sf0.01.json> <bench_full_sf0.1.json>

Prints the measured section (totals, ratio stats, worst-scalers table)
to stdout; the prose around it is maintained by hand in docs/SCALING.md.
"""
import sys, json

lo = json.load(open(sys.argv[1]))
hi = json.load(open(sys.argv[2]))
qlo, qhi = lo["queries"], hi["queries"]
common = [k for k in qhi if k in qlo and qlo[k] > 0 and qhi[k] > 0]
ratios = sorted(((qhi[k] / qlo[k], k) for k in common), reverse=True)
med = sorted(r for r, _ in ratios)[len(ratios) // 2]
super_ = [(r, k) for r, k in ratios if r >= 10.0]

print(f"n_queries common: {len(common)} (lo n={lo['n_queries']}, hi n={hi['n_queries']})")
print(f"totals: {lo['value']:.0f} s -> {hi['value']:.0f} s "
      f"({hi['value']/lo['value']:.2f}x for 10x data)")
print(f"median per-query ratio: {med:.2f}x")
print(f"superlinear (>=10x): {len(super_)} -> {super_}")
print(f"warm_sec sf0.1: {hi['warm_sec']:.0f}")
print(f"failed: lo={lo['failed']} hi={hi['failed']}")
print()
print("| query | sf0.01 | sf0.1 | ratio |")
print("|---|---|---|---|")
for r, k in ratios[:10]:
    print(f"| {k.split('_')[0]} | {qlo[k]:.2f} | {qhi[k]:.2f} | {r:.1f}x |")
