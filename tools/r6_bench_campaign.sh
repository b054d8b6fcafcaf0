#!/bin/bash
# Round-6 bench-stability campaign. Sequential (never two JVMs timing at
# once). Produces, under target/bench_r6/:
#   runA/runB  — isolated mode, ParallelGC, identical code  -> <10% gate
#   runC/runD  — isolated mode, G1GC, identical code        -> GC AB test
#   runE       — session mode (min-of-2, r5 methodology)    -> trend line
#   standalone.json — one fresh JVM per headline query, isolated stat
set -euo pipefail
cd "$(dirname "$0")/.."
export SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
OUT=target/bench_r6
mkdir -p "$OUT"

run() { # name [env overrides...]
  local name=$1; shift
  echo "=== $name $(date -u +%H:%M:%S) ==="
  # tee (not a bare grep pipe): with pipefail, Bench's deliberate exit 1
  # on any query error fails the campaign instead of being swallowed, and
  # the grep refuses runs that produced no metric line at all
  env "$@" sbt -batch "runMain graft.Bench" 2>/dev/null \
    | { grep '"metric"' || true; } > "$OUT/$name.json"
  # a run is only valid if it covered every query with zero errors
  python3 - "$OUT/$name.json" <<'PYEOF'
import json, sys
total = None
for line in open(sys.argv[1]):
    if '"metric":"total"' in line:
        total = json.loads(line)
assert total is not None, f"{sys.argv[1]}: no total metric line"
assert total["errors"] == 0, f"{sys.argv[1]}: {total['errors']} query errors"
print(f"  ok: {total['nqueries']} queries, {total['value']}s "
      f"({total['mode']}/{total['stat']})")
PYEOF
}

run runA_parallel_isolated
run runB_parallel_isolated
run runC_g1_isolated SPARK_GRAFT_GC=G1GC
run runD_g1_isolated SPARK_GRAFT_GC=G1GC
run runE_session SPARK_GRAFT_BENCH_MODE=session

# The headline set is NOT hand-copied from Bench.scala: the recorded
# total line's "queries" keys ARE Bench's headline Vector, so deriving
# the list from runA keeps the standalone 1.3x gate covering exactly the
# set the recorded JSON reports — the two cannot drift.
HEADLINE=$(python3 -c "
import json, sys
total = [json.loads(l) for l in open('$OUT/runA_parallel_isolated.json')
         if '\"metric\":\"total\"' in l][-1]
print(' '.join(total['queries']))")
echo "=== standalone $(date -u +%H:%M:%S) ==="
tools/standalone_bench.sh $HEADLINE > "$OUT/standalone_raw.jsonl"
python3 - "$OUT/standalone_raw.jsonl" "$OUT/standalone.json" $HEADLINE <<'EOF'
import json, sys
merged = {}
for line in open(sys.argv[1]):
    if '"metric":"all_queries"' in line:
        merged.update(json.loads(line)["queries"])
# a standalone JVM that crashed leaves its query silently absent from the
# merged file — fail loudly instead of letting the 1.3x gate pass vacuously
missing = [q for q in sys.argv[3:] if q not in merged]
assert not missing, f"standalone runs missing: {missing}"
with open(sys.argv[2], "w") as f:
    # compact separators: bench_compare greps for '"metric":"all_queries"'
    f.write(json.dumps({"metric": "all_queries", "queries": merged},
                       separators=(",", ":")) + "\n")
EOF
echo "=== campaign done $(date -u +%H:%M:%S) ==="
