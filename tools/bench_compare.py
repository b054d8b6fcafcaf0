#!/usr/bin/env python3
"""Compare two graft.Bench outputs (the all_queries JSON line).

Usage: bench_compare.py A.json B.json [ratio_flag_threshold]

Prints totals, total delta, and every query whose B/A ratio exceeds the
threshold (default 1.3), sorted by ratio. Used for: run-to-run agreement
checks, GC AB tests, in-session vs standalone validation, and scale runs
(where A = sf0.1 and B = x10, so ratios ~10 are expected and the
threshold argument should be e.g. 15 to flag super-linear queries).
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            if '"metric":"all_queries"' in line:
                return json.loads(line)["queries"]
    raise SystemExit(f"no all_queries line in {path}")


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    shared = sorted(set(a) & set(b))
    if not shared:
        raise SystemExit("no shared queries between the two inputs")
    # queries present in only one file would silently escape every gate
    only_a, only_b = sorted(set(a) - set(b)), sorted(set(b) - set(a))
    if only_a:
        print(f"WARNING: {len(only_a)} queries only in A: {only_a}")
    if only_b:
        print(f"WARNING: {len(only_b)} queries only in B: {only_b}")
    ta, tb = sum(a[k] for k in shared), sum(b[k] for k in shared)
    print(f"shared={len(shared)} totalA={ta:.2f}s totalB={tb:.2f}s "
          f"B/A={tb / ta:.3f}")
    rows = sorted(((b[k] / max(a[k], 1e-9), k) for k in shared), reverse=True)
    flagged = [(r, k) for r, k in rows if r > thr]
    print(f"queries with B/A > {thr}: {len(flagged)}")
    for r, k in flagged:
        print(f"  {r:6.2f}x {k}: A={a[k]:.3f}s B={b[k]:.3f}s")


if __name__ == "__main__":
    main()
