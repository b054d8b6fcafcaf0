#!/usr/bin/env python3
"""Compare two graft.Bench outputs (the all_queries JSON line).

Usage: bench_compare.py [--force] A.json B.json [ratio_flag_threshold]

Prints totals, total delta, and every query whose B/A ratio exceeds the
threshold (default 1.3), sorted by ratio. Used for: run-to-run agreement
checks, GC AB tests, in-session vs standalone validation, and scale runs
(where A = sf0.1 and B = x10, so ratios ~10 are expected and the
threshold argument should be e.g. 15 to flag super-linear queries).

An input whose total line carries "untrendable":true (the bench's own
gates: post-retry pass-noise p90 > 1.2, or — since r12 — sustained
external CPU > 1.5 cores during the measurement loop) is REFUSED —
comparing a co-loaded run defeats the flag's whole purpose. --force
overrides, with a loud annotation.

Day adjustment (r13/r14): when both artifacts carry their own in-run
calibration (chain_rows_per_sec; since r14 also chain_rows_per_sec_post
— the probe runs before AND after the measurement loop, so an artifact
carries its own intra-run drift bracket), the per-query RATIO GATE is
day-adjusted too: this box's measured cross-day drift (up to ~±40%)
swamps real code deltas, so a raw cross-day per-query ratio is not a
code statement. The r14 tripwire of record: a day-adjusted per-query
ratio > 1.3 on the ×10 canary (BENCH_r*_x10) is a regression to
explain, sf0.1 totals being scheduling-floor-bound for most queries.
"""
import json
import sys


def load(path):
    queries, untrendable, cal, cpu_ratio = None, False, None, {}
    cal_stat = None
    with open(path) as f:
        for line in f:
            if '"metric":"all_queries"' in line:
                d = json.loads(line)
                queries = d["queries"]
                cpu_ratio = d.get("cpu_ratio") or {}
            if '"metric":"total"' in line:
                tot = json.loads(line)
                untrendable = bool(tot.get("untrendable"))
                # calibration-methodology marker (r16): "converged" since
                # r16's artifacts; ABSENT = unmarked — min-of-3 through
                # r14, converged in r15 (the switch predates the marker)
                cal_stat = tot.get("cal_stat")
                pre = tot.get("chain_rows_per_sec")
                post = tot.get("chain_rows_per_sec_post")
                both = [x for x in (pre, post) if x]
                # midpoint of the pre/post bracket when both probes were
                # clean (each probe self-suppresses under co-load); a
                # single surviving probe degrades to the r13 one-point
                # behavior rather than discarding the artifact
                cal = sum(both) / len(both) if both else None
                # r12 machine-state evidence: print it so a clean compare
                # also shows WHY the inputs are comparable
                ext = tot.get("ext_cpu_cores")
                if ext is not None:
                    bracket = (f"{pre or '-'}..{post or '-'}"
                               if (pre or post) else "-")
                    print(f"{path}: ext_cpu_cores={ext} "
                          f"loadavg1={tot.get('loadavg1')} "
                          f"chain_rows_per_sec={bracket} "
                          f"reason={tot.get('untrendable_reason', '-')}")
    if queries is None:
        raise SystemExit(f"no all_queries line in {path}")
    return queries, untrendable, cal, cpu_ratio, cal_stat


def classify(wall_ratio, cpu_ratio_ratio):
    """Attribute a flagged wall ratio using CPU-seconds (r14).

    The artifact's per-query cpu_ratio (JVM cpu / wall of the reported
    pass) lets a flag self-attribute: stolen/blocked time inflates WALL
    while CPU-seconds stay flat, so cpu-s ratio << wall ratio = the
    machine withheld cores (hypervisor steal, IO block) — not code. A
    cpu-s ratio tracking the wall ratio means the JVM genuinely burned
    proportionally more cycles, which is EITHER more work (code/data) or
    a memory-bandwidth-contended host (stalled cycles count as busy) —
    only a same-day A/B separates those two.
    """
    if cpu_ratio_ratio is None:
        return ""
    if cpu_ratio_ratio < 0.55 * wall_ratio:
        return " [machine: wall-only, cpu-s flat — blocked/stolen]"
    if cpu_ratio_ratio > 0.8 * wall_ratio:
        return " [cpu-proportional: code/data OR bandwidth-contended day — needs same-day A/B]"
    return " [mixed]"


def main():
    force = "--force" in sys.argv
    argv = [a for a in sys.argv if a != "--force"]
    (a, ua, ca, cra, csa), (b, ub, cb, crb, csb) = load(argv[1]), load(argv[2])
    flagged_inputs = [p for p, u in ((argv[1], ua), (argv[2], ub)) if u]
    if flagged_inputs:
        msg = (f"untrendable input(s) {flagged_inputs}: the bench flagged "
               f"these runs (pass-noise p90 > 1.2 after retries, or external "
               f"CPU > 1.5 cores) — per-query ratios would compare co-load, "
               f"not code")
        if not force:
            raise SystemExit(f"REFUSED: {msg}. Re-run on a quiet machine or "
                             f"pass --force to compare anyway.")
        print(f"WARNING (--force): {msg}")
    thr = float(argv[3]) if len(argv) > 3 else 1.3
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
    # Day factor: B's day is slower when cb < ca → scale B's walls down
    # by cb/ca. The adjustment assumes wall scales ~1/throughput; it is
    # a correction, not a substitute for a same-day A/B.
    day = (cb / ca) if (ca and cb) else None
    # r16 (ADVICE): the probe statistic changed in r15 (min-of-3 →
    # converged), which changes what chain_rows_per_sec MEANS on a fast
    # machine (old quiet-day figures were JIT-capped). A day factor
    # dividing a converged number by a min-of-3 one is systematically
    # biased (it can only overstate the newer day, penalizing the newer
    # round — the honest direction, but a bias). Warn whenever the two
    # methods are known different or can't be confirmed equal.
    if day is not None and csa != csb:
        known = {p: s for p, s in ((argv[1], csa), (argv[2], csb))}
        print(f"WARNING: calibration methods differ or are unmarked "
              f"({known}) — unmarked = min-of-3 through r14, converged "
              f"in r15; the day factor below is CROSS-METHOD and can "
              f"only penalize the converged side. Treat day-adjusted "
              f"ratios as a bound, not a measurement.")
    elif day is not None and csa is None and csb is None:
        # r16 ADVICE: two UNMARKED artifacts pass the != test (None ==
        # None) yet may still have used different methods — exactly the
        # biased comparison the warning above describes, just
        # unconfirmable. Unmarked means pre-marker (r14 or earlier =
        # min-of-3) OR a hand-built artifact; equality is an assumption.
        print("WARNING: BOTH artifacts are unmarked (no cal_stat) — the "
              "calibration methods cannot be confirmed equal, and a day "
              "factor is being applied. If either artifact predates r15 "
              "and the other does not, this is the cross-method bias in "
              "disguise. Treat day-adjusted ratios as a bound.")
    if day is not None:
        print(f"day calibration A={ca:.0f} B={cb:.0f} rows/s; "
              f"day-adjusted B/A={(tb / ta) * day:.3f} "
              f"(raw {tb / ta:.3f} x day {day:.3f})")
    # Per-query gate: day-adjusted when both artifacts self-calibrated
    # (the r14 tripwire of record for the ×10 canary), raw otherwise —
    # and the output SAYS which one gated, so a reader never mistakes a
    # raw cross-day flag for a code claim.
    adj = day if day is not None else 1.0
    rows = sorted(((b[k] / max(a[k], 1e-9) * adj, b[k] / max(a[k], 1e-9), k)
                   for k in shared), reverse=True)
    gate = "day-adjusted" if day is not None else "RAW (no calibration)"
    flagged = [(r, raw, k) for r, raw, k in rows if r > thr]
    print(f"queries with {gate} B/A > {thr}: {len(flagged)}")
    for r, raw, k in flagged:
        # CPU-seconds attribution when both artifacts carry cpu_ratio
        crr = None
        if k in cra and k in crb and a[k] * cra[k] > 0:
            crr = (b[k] * crb[k]) / (a[k] * cra[k])
        note = classify(raw, crr)
        # `is not None`, not truthiness: a legitimate 0.0 ratio must
        # still print its supporting cpu-s numbers beside the note
        cpus = (f" cpu-s {a[k]*cra[k]:.2f}->{b[k]*crb[k]:.2f}"
                if crr is not None else "")
        print(f"  {r:6.2f}x (raw {raw:.2f}x) {k}: A={a[k]:.3f}s "
              f"B={b[k]:.3f}s{cpus}{note}")


if __name__ == "__main__":
    main()
