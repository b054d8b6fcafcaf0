#!/usr/bin/env python3
"""Harvest the r13 x1000 sim_join campaign run.

The launched campaign script's own ext-cores line is KNOWN BROKEN (its
child_cpu_sec used `times` in a pipeline subshell, which always reads
0 — found by the r13 review after launch; the script could not be
fixed in place without corrupting the running bash instance, which
reads scripts by byte offset). This script reconstructs the quietness
bracket from the independent 60s sampler instead:

  /tmp/r13_sampler.log columns: epoch machine_busy_jiffies
  jvm_utime+stime_jiffies stage_histogram ("4:32" = 32 task threads in
  stage 4; "EXITED" marks the JVM's death)

ext cores over the sampled span = (machine busy delta − JVM cpu delta)
/ 100 / wall — the same arithmetic as Bench's in-artifact gate. Also
prints the stage timeline (first/last sighting of each stage) so the
enumerate stage's tail shape is readable straight from the harvest.

Usage: r13_harvest.py [sampler_log]
"""
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r13_sampler.log"
    rows = []
    for line in open(path):
        parts = line.split()
        if len(parts) >= 3 and parts[1] != "EXITED":
            rows.append((int(parts[0]), int(parts[1]), int(parts[2]),
                         " ".join(parts[3:])))
    if len(rows) < 2:
        raise SystemExit("not enough samples")
    (t0, b0, j0, _), (t1, b1, j1, _) = rows[0], rows[-1]
    wall = t1 - t0
    ext = max(0.0, (b1 - b0) / 100.0 - (j1 - j0) / 100.0) / wall
    jvm_cores = (j1 - j0) / 100.0 / wall
    print(f"sampled span: {wall} s ({len(rows)} samples)")
    print(f"jvm avg cores: {jvm_cores:.2f}")
    print(f"ext_cpu_cores: {ext:.2f} (gate threshold 1.5)")
    # stage timeline: first/last epoch each stage id was seen running
    seen = {}
    for t, _, _, st in rows:
        for tok in st.split():
            if ":" in tok:
                sid = tok.split(":")[0]
                first, _ = seen.get(sid, (t, t))
                seen[sid] = (first, t)
    print("stage timeline (first..last sighting, minutes from start):")
    for sid, (f, l) in sorted(seen.items(), key=lambda kv: kv[1][0]):
        print(f"  stage {sid}: {(f - t0) / 60:.0f}..{(l - t0) / 60:.0f} min")
    # occupancy of the final hour (tail shape)
    tail = [r for r in rows if r[0] >= t1 - 3600]
    if len(tail) >= 2:
        (ta, ba, ja, _), (tb, bb, jb, _) = tail[0], tail[-1]
        if tb > ta:
            print(f"final-hour jvm avg cores: {(jb - ja) / 100.0 / (tb - ta):.2f}")


if __name__ == "__main__":
    main()
