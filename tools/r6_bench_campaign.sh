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

HEADLINE="q1_pricing q3_revenue_by_customer q5_region_revenue join_bucketed \
sort_topk_orders window_running_sum stream_window_agg dedup_hash dedup_ccnet \
dedup_minhash dedup_minhash_mllib dedup_simhash dedup_sem_lsh dedup_kcenter \
sim_topk_brute sim_lsh_topk sim_ivf_topk sim_join eval_bleu eval_cider_d \
kbc_chunks t2s_execution t2s_exec_classify text_quality_score text_fingerprint"
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
