#!/bin/bash
# One-command reproduction of a round's claims (r14 verdict stretch #7):
#   1. sbt test                 — the scalatest gate (also compiles the
#                                 classes every later step runs from)
#   2. Verify @ sf0.01 + DuckDB — the correctness gate: graft.Verify dumps
#                                 every SparkEntry query + oracle_sql.json,
#                                 tools/check_oracle.py replays the oracles
#                                 in DuckDB and diffs (rows/schema/values)
#   3. recorded sf0.1 bench     — quiet-gated (tools/recorded_bench.sh):
#                                 REFUSES on a busy machine or open
#                                 campaign window instead of emitting an
#                                 untrendable number; a refusal here is a
#                                 machine statement, not a repro failure
# Usage: tools/judge_repro.sh [outDir]     (default /tmp/judge_repro)
# Exit: non-zero iff step 1 or 2 fails; step 3's refusal is reported but
#       does not fail the repro (its artifact self-flags when dirty).
set -u -o pipefail
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/judge_repro}"
mkdir -p "$OUT"

echo "== 1/3 sbt test =="
sbt -batch test 2>&1 | tee "$OUT/sbt_test.log" | tail -5
grep -q "All tests passed." "$OUT/sbt_test.log" || {
  echo "judge_repro: FAIL - sbt test did not pass (see $OUT/sbt_test.log)" >&2
  exit 1
}

echo "== 2/3 Verify @ sf0.01 + DuckDB oracle =="
rm -rf "$OUT/verify"
RUN_MAIN_ERRF="$OUT/verify.err" \
  tools/run_main.sh graft.Verify /root/testdata/sf0.01 "$OUT/verify" \
  > "$OUT/verify.out" || {
  echo "judge_repro: FAIL - graft.Verify died (see $OUT/verify.err)" >&2
  exit 1
}
python3 tools/check_oracle.py /root/testdata/sf0.01 "$OUT/verify" \
  | tee "$OUT/oracle.txt"
# Gate the ORACLE STEP ITSELF (r15 ADVICE, medium): with pipefail but no
# -e, a crashed check_oracle.py used to leave ok=0/bad=0 and the script
# printed '0 OK, 0 failing' and exited green — a dead correctness gate
# reporting success. The pipeline status AND a non-zero OK count are
# both required before the step may pass.
orc=${PIPESTATUS[0]}
[ "$orc" -eq 0 ] || {
  echo "judge_repro: FAIL - check_oracle.py exited $orc (see $OUT/oracle.txt)" >&2
  exit 1
}
ok=$(grep -c '^OK' "$OUT/oracle.txt" || true)
bad=$(grep -cE '^(MISMATCH|SPARK-MISSING)' "$OUT/oracle.txt" || true)
echo "oracle: $ok OK, $bad failing"
[ "$bad" -eq 0 ] || {
  echo "judge_repro: FAIL - $bad oracle mismatches (see $OUT/oracle.txt)" >&2
  exit 1
}
[ "$ok" -gt 0 ] || {
  echo "judge_repro: FAIL - oracle step produced ZERO OK lines (empty or" \
       "truncated output is not a pass; see $OUT/oracle.txt)" >&2
  exit 1
}

# Driver-artifact guard (r16 verdict #2): CORRECTNESS_r16.json landed as
# an empty {} and nothing in the repo flagged it — the round's formal
# correctness signal went missing unremarked. Diff the driver artifact
# against what Verify just dumped: the CURRENT round's artifact (round =
# VERDICT.md header + 1), when present, must be non-empty and cover the
# registry (hard FAIL); a missing current artifact is normal mid-round
# (the driver writes it at round close) but the NEWEST prior artifact
# being empty is shouted so it can never again slip by silently.
cur=$(( $(sed -n 's/^# VERDICT — round \([0-9]*\).*/\1/p' VERDICT.md | head -1) + 1 ))
if [ -f "CORRECTNESS_r${cur}.json" ]; then
  echo "== 2.5/3 driver artifact guard (CORRECTNESS_r${cur}.json) =="
  python3 tools/correctness_guard.py "CORRECTNESS_r${cur}.json" "$OUT/verify" || {
    echo "judge_repro: FAIL - driver artifact CORRECTNESS_r${cur}.json is" \
         "empty/incomplete (the r16 {} condition) — the round has no formal" \
         "correctness signal" >&2
    exit 1
  }
else
  newest=$(ls CORRECTNESS_r*.json 2>/dev/null | sort -V | tail -1)
  echo "== 2.5/3 driver artifact guard: CORRECTNESS_r${cur}.json not yet" \
       "written (driver runs at round close) =="
  if [ -n "$newest" ] && ! python3 -c \
      "import json,sys; d=json.load(open('$newest')); sys.exit(0 if d else 1)" \
      2>/dev/null; then
    echo "judge_repro: WARNING - newest driver artifact $newest is EMPTY" \
         "(known r16 condition) — the CURRENT round must land a non-empty one"
  fi
fi

echo "== 3/3 recorded sf0.1 bench (quiet-gated; may refuse) =="
if tools/recorded_bench.sh "$OUT/bench.json"; then
  grep -o '"untrendable[^,}]*' "$OUT/bench.json" && \
    echo "bench ran but self-flagged — walls are not evidence" || \
    echo "bench clean: $OUT/bench.json"
else
  echo "bench refused (machine busy / campaign window) — re-run step 3" \
       "alone on a quiet machine: tools/recorded_bench.sh $OUT/bench.json"
fi
echo "JUDGE_REPRO_DONE ok=$ok"
