#!/bin/bash
# Round-17 campaign: prove the rankTopK pre-reduce (the r16 verdict #1
# structural fix) at scale, ON THE DEFAULT
# spark.sql.objectHashAggregate.sortBased.fallbackThreshold — the whole
# point is that no conf needs raising anymore. Every cell's digest must
# be bit-identical to its r15/r16 pin (same corpus, same slice):
#
#   ivf_x100   IvfTopKAB 10000 10 ab on /tmp/graft_x100 (200k vectors,
#              10k queries). r15 pin (DEFAULT threshold, sort tax paid
#              inside the walls): healed 256.4 s / unhealed 1037.9 s,
#              digest -8685042299636424551, rows 100000. The healed
#              delta vs 256.4 s IS the isolated sort-fallback tax
#              (r16 verdict #4) — same day caveats apply.
#   ivf_x1000  IvfTopKAB 1000 10 ab on /tmp/graft_x1000 (2M vectors,
#              10k queries). r16 pin (threshold raised to 131072):
#              healed 250.3 s / unhealed 3046.9 s, digest
#              2682960204340988367, rows 100000. Matching walls at the
#              DEFAULT threshold = the cliff is dead structurally.
#   lsh_x1000  LshTopKAB 5000 10 ab on /tmp/graft_x1000 (50k queries —
#              the r15 pin's slice; the `vec_id % 1000 < arg/200` slice
#              selects 10x the queries at x1000, so arg 50000 would be
#              500k queries, NOT the pin: the ivf calibration trap,
#              corrected r17). r15 pin: broadcast+heal 434.8 s /
#              fallback 224.5 s, digest -5137377157373334248, rows
#              500000. r17 result: 119.8 s / 63.2 s, digest IDENTICAL.
#   lsh_x1000_cap500k  LshTopKAB 50000 10 ab — the 500k-query capacity
#              shape (5x over MaxBroadcastQueries, broadcast forced in
#              arm A): the key-count regime whose aggregation died
#              ENOSPC on defaults before the pre-reduce. r17 result:
#              881.2 s / 427.1 s, both arms digest
#              -8472316035236962223, rows 5,000,000.
#
# Corpus (unchanged from r16, sampled): /tmp/graft_x1000 = COMPOSED
# recipe (ScaleGen sf0.1 → x100 [suffixWords=1] → x1000 [10, 25]).
#
# Usage: r17_campaign.sh <ivf_x100|ivf_x1000|lsh_x1000>
# A wrapper holding ONE flock window exports CAMPAIGN_LOCK_HELD=1.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r17_campaign.log
say() { echo "[$(date +%T)] $*" | tee -a "$LOG"; }

busy_jiffies() { awk '/^cpu /{print $2+$3+$4+$7+$8+$9; exit}' /proc/stat; }

FREEZE_OPTS="-Dspark.network.timeout=600s -Dspark.executor.heartbeatInterval=60s"

# Frozen classpath snapshot: a later sbt compile must not swap
# lazily-loaded classes under a long-running attributed cell.
CPSNAP=/tmp/r17_head_cp
if [ ! -f "$CPSNAP/GIT_HEAD" ] || \
   [ "$(cat "$CPSNAP/GIT_HEAD")" != "$(git rev-parse HEAD)" ]; then
  rm -rf "$CPSNAP"; cp -a target/scala-2.13/classes "$CPSNAP"
  git rev-parse HEAD > "$CPSNAP/GIT_HEAD"
fi

cell() {
  local label="$1" tmo="$2"; shift 2
  tools/quiet_guard.sh || { say "$label refused: machine not quiet"; return 1; }
  say "$label start (classpath $CPSNAP @ $(cat "$CPSNAP/GIT_HEAD" | cut -c1-8))"
  local busy0 t0 rc t1 busy1 jvm
  busy0=$(busy_jiffies); t0=$(date +%s)
  TIMEFORMAT='%U %S'
  { time timeout "$tmo" tools/run_main.sh "$@" \
      > "/tmp/r17_${label// /_}.out" ; } 2> "/tmp/r17_${label// /_}.cputime"
  rc=$?
  t1=$(date +%s); busy1=$(busy_jiffies)
  jvm=$(awk '{print $1+$2}' "/tmp/r17_${label// /_}.cputime")
  grep '"metric"' "/tmp/r17_${label// /_}.out" | tee -a "$LOG"
  say "$label rc=$rc wall=$((t1-t0))s jvm_cpu=${jvm}s $(awk -v b0="$busy0" -v b1="$busy1" -v j="$jvm" -v w=$((t1-t0)) 'BEGIN{e=((b1-b0)/100-j)/w; if(e<0)e=0; printf "ext_cpu_cores=%.2f", e}')"
  return "$rc"
}

CELL="${1:?usage: r17_campaign.sh <ivf_x100|ivf_x1000|lsh_x1000>}"; shift || true

if [ "${CAMPAIGN_LOCK_HELD:-0}" != 1 ]; then
  exec 9>>/tmp/graft_campaign.lock
  flock -n 9 || { say "refused: campaign window already open (flock)"; exit 1; }
  echo $$ > /tmp/graft_campaign.lock
fi

# NOTE: no fallbackThreshold anywhere below — the DEFAULT (128) is the
# configuration under test.
case "$CELL" in
  ivf_x100)
    SPARK_GRAFT_SF_DIR=/tmp/graft_x100 SPARK_DRIVER_MEM=16g \
      SPARK_GRAFT_CPUS=32 RUN_MAIN_CP="$CPSNAP" \
      RUN_MAIN_ERRF=/tmp/r17_ivf_x100.err \
      cell "ivf_x100" 7200 graft.dev.IvfTopKAB 10000 10 ab
    ;;
  ivf_x1000)
    SPARK_GRAFT_SF_DIR=/tmp/graft_x1000 SPARK_DRIVER_MEM=16g \
      SPARK_GRAFT_CPUS=32 RUN_MAIN_CP="$CPSNAP" \
      SPARK_GRAFT_JAVA_OPTS="$FREEZE_OPTS" \
      RUN_MAIN_ERRF=/tmp/r17_ivf_x1000.err \
      cell "ivf_x1000" 21600 graft.dev.IvfTopKAB 1000 10 ab
    ;;
  lsh_x1000)
    SPARK_GRAFT_SF_DIR=/tmp/graft_x1000 SPARK_DRIVER_MEM=16g \
      SPARK_GRAFT_CPUS=32 RUN_MAIN_CP="$CPSNAP" \
      SPARK_GRAFT_JAVA_OPTS="$FREEZE_OPTS" \
      RUN_MAIN_ERRF=/tmp/r17_lsh_x1000.err \
      cell "lsh_x1000" 7200 graft.dev.LshTopKAB 5000 10 ab
    ;;
  lsh_x1000_cap500k)
    SPARK_GRAFT_SF_DIR=/tmp/graft_x1000 SPARK_DRIVER_MEM=16g \
      SPARK_GRAFT_CPUS=32 RUN_MAIN_CP="$CPSNAP" \
      SPARK_GRAFT_JAVA_OPTS="$FREEZE_OPTS" \
      RUN_MAIN_ERRF=/tmp/r17_lsh_x1000_cap500k.err \
      cell "lsh_x1000_cap500k" 7200 graft.dev.LshTopKAB 50000 10 ab
    ;;
  *)
    say "unknown cell: $CELL"; exit 1
    ;;
esac
