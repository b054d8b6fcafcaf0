#!/bin/bash
# Round-12 campaign: hygiene-gated, and deliberately small — r12's jobs
# are (a) harvesting the r11 ×1000 sim_join already in flight and (b) a
# clean recorded bench, which must NOT overlap. Every cell:
#   - takes the campaign lock (blocks tools/recorded_bench.sh for the
#     whole window),
#   - calls tools/quiet_guard.sh before starting (refuses while any
#     graft JVM runs — including the in-flight r11 harvest target).
# Usage: tools/r12_campaign.sh <cell> [args...]
#   cell "simjoin_x1000_retry" — the one budgeted retry (r11 verdict #2)
#        if the in-flight run dies unharvested; ~5-7 h from the CPU fit,
#        run FIRST and alone.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r12_campaign.log
say() { echo "[$(date +%T)] $*" | tee -a "$LOG"; }

tools/quiet_guard.sh || { say "cell refused: machine not quiet"; exit 1; }
# Campaign window held with flock(2) on a persistent fd (r13 — the
# earlier rm-then-noclobber dance was itself a TOCTOU: two starters
# observing a dead-pid lock could each rm, the second deleting the
# first's fresh lock, so both campaigns ran and the loser's EXIT trap
# removed the winner's lock). The kernel releases the flock on process
# death: no stale state, nothing to rm, no trap needed.
exec 9>>/tmp/graft_campaign.lock
flock -n 9 || { say "cell refused: campaign window already open (flock)"; exit 1; }
echo $$ > /tmp/graft_campaign.lock   # diagnostics + legacy pid readers

CELL="${1:?usage: r12_campaign.sh <cell>}"; shift
case "$CELL" in
  simjoin_x1000_retry)
    # budget from the r11 two-point CPU fit: ~500-620k CPU-s at ~30
    # cores ≈ 5-7 h wall; timeout set from the fit's upper edge, not a
    # wish (the r11 P2 timeout of 100 min was never realistic)
    say "simjoin_x1000_retry start (timeout 8h)"
    SPARK_GRAFT_SF_DIR=/tmp/graft_x1000 RUN_MAIN_ERRF=/tmp/r12_simjoin.err \
      timeout 28800 tools/run_main.sh graft.dev.SimJoinAB 0 | tee -a "$LOG"
    rc=${PIPESTATUS[0]}
    say "simjoin_x1000_retry rc=$rc"
    # a timed-out or dead cell must fail the SCRIPT too — callers check
    # $? to decide whether the one budgeted retry actually happened
    exit "$rc"
    ;;
  *)
    say "unknown cell: $CELL"; exit 1
    ;;
esac
