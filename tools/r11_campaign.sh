#!/bin/bash
# Round-11 measurement campaign (the batch rounds 9-10 deferred), strictly
# serialized on a quiet machine:
#   P1: SimJoinAB x100 centering matrix {8, 8:center, 11, 11:center},
#       fresh JVM per cell (fills the bits=8 pair-count cell and proves or
#       kills the centering knob).
#   P2: sim_join x1000 at auto-bits (11 at 2M rows) with the P1 winner's
#       centering, run to completion (timeout 100 min).
#   P3: dedup_minhash x1000 under the NEW auto scratch budget, 16 GiB
#       (wave-count + budget breadcrumb evidence).
#   P4: heap-constant probe — dedup_minhash x1000 at 8 GiB/32 threads with
#       a jmap -histo sampler so the GC death names its dominant classes.
# Logs: /tmp/r11_campaign.log (driver), /tmp/r11_scratch.log (disk),
#       /tmp/r11_heap_histo.log (P4 histograms).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r11_campaign.log
: > "$LOG"
say() { echo "[$(date +%T)] $*" | tee -a "$LOG"; }

sampler_start() {
  ( while true; do
      b=$(du -sb /tmp/blockmgr-* /tmp/spark-* 2>/dev/null | awk '{s+=$1} END{print s+0}')
      f=$(df -B1 --output=avail / | tail -1 | tr -d ' ')
      echo "scratch $(date +%s) $1 $b $f" >> /tmp/r11_scratch.log
      sleep 5
    done ) &
  SAMPLER=$!
}
sampler_stop() { kill "$SAMPLER" 2>/dev/null; wait "$SAMPLER" 2>/dev/null; }

# ── P1: x100 centering matrix, fresh JVM per cell ─────────────────────
for cell in 8 8:center 11 11:center; do
  say "P1 cell $cell start"
  sampler_start "p1_$cell"
  SPARK_GRAFT_SF_DIR=/tmp/graft_x100 RUN_MAIN_ERRF=/tmp/r11_p1_${cell/:/_}.err \
    timeout 3000 tools/run_main.sh graft.dev.SimJoinAB "$cell" | tee -a "$LOG"
  say "P1 cell $cell rc=${PIPESTATUS[0]}"
  sampler_stop
done

# winner at bits=11 by wall clock (the candidate-work proxy SimJoinAB
# exposes; pair counts are in the log for the recall side)
S11=$(grep '"bits":11,"center":false' "$LOG" | sed 's/.*"sec"://;s/,.*//;s/}.*//' | head -1)
S11C=$(grep '"bits":11,"center":true' "$LOG" | sed 's/.*"sec"://;s/,.*//;s/}.*//' | head -1)
CELL=11
if [ -n "${S11C:-}" ] && [ -n "${S11:-}" ] && \
   awk "BEGIN{exit !($S11C < $S11)}"; then CELL="11:center"; fi
say "P2 winner cell: $CELL (11 uncentered=$S11 s, centered=$S11C s)"

# ── P2: x1000 sim_join at auto-width (11) with the winner ─────────────
say "P2 x1000 sim_join start (cell $CELL)"
sampler_start "p2_x1000_$CELL"
SPARK_GRAFT_SF_DIR=/tmp/graft_x1000 RUN_MAIN_ERRF=/tmp/r11_p2.err \
  timeout 6000 tools/run_main.sh graft.dev.SimJoinAB "$CELL" | tee -a "$LOG"
say "P2 rc=${PIPESTATUS[0]}"
sampler_stop

# ── P3: x1000 minhash under the auto scratch budget, 16 GiB ───────────
say "P3 x1000 dedup_minhash auto-budget start"
sampler_start p3_minhash_auto
SPARK_GRAFT_SF_DIR=/tmp/graft_x1000 SPARK_DRIVER_MEM=16g SPARK_GRAFT_PASSES=1 \
  timeout 3000 tools/run_query_debug.sh dedup_minhash /tmp/r11_p3.err | tee -a "$LOG"
say "P3 rc=${PIPESTATUS[0]}"
sampler_stop

# ── P4: heap probe — 8 GiB/32t with jmap histograms every 45 s ────────
say "P4 8GiB heap probe start"
sampler_start p4_minhash_8g
( sleep 60
  while true; do
    pid=$(pgrep -f 'graft.Bench' | head -1)
    if [ -n "$pid" ]; then
      echo "=== histo $(date +%T) pid=$pid ===" >> /tmp/r11_heap_histo.log
      jmap -histo "$pid" 2>/dev/null | head -20 >> /tmp/r11_heap_histo.log
    fi
    sleep 45
  done ) &
HISTO=$!
SPARK_GRAFT_SF_DIR=/tmp/graft_x1000 SPARK_DRIVER_MEM=8g SPARK_GRAFT_PASSES=1 \
  SPARK_GRAFT_JAVA_OPTS="-Xlog:gc:/tmp/r11_p4_gc.log" \
  timeout 2700 tools/run_query_debug.sh dedup_minhash /tmp/r11_p4.err | tee -a "$LOG"
say "P4 rc=${PIPESTATUS[0]} (nonzero expected if the GC-overhead death reproduces)"
kill "$HISTO" 2>/dev/null
sampler_stop
say CAMPAIGN_DONE
