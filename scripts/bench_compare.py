#!/usr/bin/env python3
"""Compare two bench_out.json artifacts on their common queries.

Usage: bench_compare.py <a.json> <b.json> [label_a] [label_b]

Prints the summed warm-median totals over common queries, the geomean
ratio b/a, and the biggest movers in both directions — the
round-over-round regression read, kept as a script so it cannot drift
between rounds.
"""
import sys, json, math

def main():
    if len(sys.argv) < 3:
        sys.exit("usage: bench_compare.py <a.json> <b.json> [label_a] [label_b]")
    pa, pb = sys.argv[1], sys.argv[2]
    la = sys.argv[3] if len(sys.argv) > 3 else pa
    lb = sys.argv[4] if len(sys.argv) > 4 else pb
    a = json.load(open(pa))
    b = json.load(open(pb))
    qa, qb = a["queries_median"], b["queries_median"]
    common = sorted(set(qa) & set(qb))
    common = [q for q in common if qa[q] > 0 and qb[q] > 0]
    if not common:
        sys.exit("no common queries with positive medians — nothing to compare")
    sa = sum(qa[q] for q in common)
    sb = sum(qb[q] for q in common)
    gm = math.exp(sum(math.log(qb[q] / qa[q]) for q in common) / len(common))
    print(f"common queries: {len(common)}")
    print(f"{la}: loadavg={a.get('loadavg')} contaminated={a.get('contaminated')} sum={sa:.1f}s")
    print(f"{lb}: loadavg={b.get('loadavg')} contaminated={b.get('contaminated')} sum={sb:.1f}s")
    print(f"geomean ratio {lb}/{la}: {gm:.3f}x")
    movers = sorted(common, key=lambda q: qb[q] / qa[q])
    print("\nbiggest slowdowns:")
    for q in movers[-8:][::-1]:
        print(f"  {q}: {qa[q]:.2f}s -> {qb[q]:.2f}s ({qb[q]/qa[q]:.2f}x)")
    print("biggest speedups:")
    for q in movers[:5]:
        print(f"  {q}: {qa[q]:.2f}s -> {qb[q]:.2f}s ({qb[q]/qa[q]:.2f}x)")

if __name__ == "__main__":
    main()
