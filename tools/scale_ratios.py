#!/usr/bin/env python3
"""Per-query scale-step analysis between two BENCH_FULL.json artifacts.

Usage: scale_ratios.py <bench_small.json> <bench_big.json> [data_ratio]

Prints each query's wall ratio (big/small) sorted descending, with the
nominal data ratio (default 10) as the linear reference. Local-mode
per-query fixed overhead (~0.3-0.5 s planning + task launch) dominates
small readings, so ratios are also shown net of a floor estimated as
the 10th percentile of the small run's timings. Queries whose big-run
wall exceeds data_ratio x small net-of-floor are flagged SUPERLINEAR
candidates for plan inspection; sub-floor entries are marked overhead-
bound (their ratio is noise, not signal).
"""
import json
import sys

small = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))
ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

qs, qb = small["queries"], big["queries"]
shared = sorted(set(qs) & set(qb))


def p10_floor(d):
    # per-run overhead floor: each run's own 10th-percentile timing —
    # subtracting the SMALL run's floor from the big run understated
    # big-run overhead and inflated net ratios for cheap queries
    # (round-7 ADVICE item)
    vals = sorted(v for v in d.values() if v >= 0)
    return vals[len(vals) // 10] if vals else 0.0


floor_s, floor_b = p10_floor(qs), p10_floor(qb)

rows = []
for k in shared:
    s, b = qs[k], qb[k]
    if s < 0 or b < 0:
        continue
    net_s = max(s - floor_s, 1e-3)
    net_b = max(b - floor_b, 0.0)
    rows.append((net_b / net_s, k, s, b))
rows.sort(reverse=True)

print(f"floor_small={floor_s:.3f}s floor_big={floor_b:.3f}s "
      f"data_ratio={ratio}  shared={len(rows)}")
print(f"{'query':34s} {'small':>8s} {'big':>8s} {'net_ratio':>9s}  verdict")
sup = 0
for r, k, s, b in rows:
    if s <= floor_s * 2.0:
        # near-floor small readings carry no slope signal: the net
        # ratio is division by (almost) the floor estimate's noise
        verdict = "overhead-bound"
    elif r > ratio * 1.5 and b > max(2.0, 5.0 * floor_b):
        # require the big run to be materially large in absolute terms
        # before alleging superlinearity — a 0.8s big reading cannot
        # evidence a scale-killer regardless of its ratio
        verdict = "SUPERLINEAR?"
        sup += 1
    elif r > ratio:
        verdict = "~linear+"
    else:
        verdict = "sublinear/linear"
    print(f"{k:34s} {s:8.3f} {b:8.3f} {r:9.2f}  {verdict}")
print(f"\nSUPERLINEAR candidates: {sup}")
