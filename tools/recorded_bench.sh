#!/bin/bash
# The bench of record, hygiene edition: graft.Bench at sf0.1 in a fresh
# JVM, but ONLY on a provably quiet machine —
#   1. tools/quiet_guard.sh --bench must pass (no graft JVM alive, no
#      open campaign window), else this script refuses and exits 1;
#   2. /proc/loadavg is echoed before and after so the log carries the
#      same machine-state evidence the JSON's ext_cpu_cores field does.
# Usage: tools/recorded_bench.sh [outFile]   (default: stdout)
set -u
cd "$(dirname "$0")/.."
tools/quiet_guard.sh --bench || { echo "recorded_bench: refused" >&2; exit 1; }
# Hold the campaign flock for the WHOLE bench (r12 advice: a probe that
# checks-then-proceeds reopens the window between check and start; the
# kernel releases this on exit, so no stale state, no rm, no race).
exec 9>>/tmp/graft_campaign.lock
flock -n 9 || { echo "recorded_bench: refused (campaign flock held)" >&2; exit 1; }
echo $$ > /tmp/graft_campaign.lock   # diagnostics + legacy pid readers
OUT="${1:-/dev/stdout}"
echo "# loadavg before: $(cat /proc/loadavg)" >&2
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
  RUN_MAIN_ERRF="${RUN_MAIN_ERRF:-/tmp/recorded_bench.err}" \
  tools/run_main.sh graft.Bench > "$OUT"
rc=$?
echo "# loadavg after: $(cat /proc/loadavg)" >&2
exit $rc
