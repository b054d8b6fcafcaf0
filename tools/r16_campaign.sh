#!/bin/bash
# Round-16 campaign: settle the ×1000 near-dup trend base on the
# NEW-recipe corpus (r15 verdict #1) and price the ivfTopK heal at
# ×1000 (verdict #4).
#
# The corpus fact being settled (sampled from the parquet this round):
#   /tmp/graft_x1000 = COMPOSED recipe —
#     ScaleGen /root/testdata/sf0.1 /tmp/graft_x100 100      (suffixWords=1)
#     ScaleGen /tmp/graft_x100 /tmp/graft_x1000 10 25        (suffixWords=25)
#   (99/100 docs carry the classic '#rN' inner suffix; outer replicas
#   r1..r9 append 25 'rMwK' words each — first-level near-dup clusters
#   of ~100, outer replicas below the 0.9 Jaccard threshold.)
#   The r12 991.3 s pin ran on the DIRECT recipe (ScaleGen sf0.1 →
#   x1000, N=1000, suffixWords=1), which no longer exists on disk.
#
# Cells (each takes quiet_guard; for a back-to-back sequence the
# caller holds ONE flock window on /tmp/graft_campaign.lock and exports
# CAMPAIGN_LOCK_HELD=1 so each invocation trusts the parent's lock —
# flock is exclusive across open file descriptions even in one process,
# so re-acquiring here would refuse against the caller's own window):
#   probe        converged ThroughputBench at sf0.1 — the day figure
#   minhash head ×1000 dedup_minhash, HEAD classpath snapshot, 1 pass
#   minhash r12  same cell on the FROZEN r12 classpath
#                (/tmp/graft_r12_src @ 93974de) — the same-day
#                shadow control that died to a host freeze in r15
#   simhash      ×1000 dedup_simhash re-pin at HEAD (new recipe)
#   semlsh       ×1000 dedup_sem_lsh re-pin at HEAD (new recipe)
#   ivf_ab       IvfTopKAB ×1000 (2M vectors, 10k queries, healed vs
#                unhealed, digest-checked)
#
# Freeze tolerance (the r15 shadow control died at minute 8 to a
# ~2-minute whole-guest host stall): every ×1000 JVM runs with
# spark.network.timeout=600s + 60 s heartbeats.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r16_campaign.log
say() { echo "[$(date +%T)] $*" | tee -a "$LOG"; }

busy_jiffies() { awk '/^cpu /{print $2+$3+$4+$7+$8+$9; exit}' /proc/stat; }

FREEZE_OPTS="-Dspark.network.timeout=600s -Dspark.executor.heartbeatInterval=60s"

# Run one attributed cell: label, timeout_s, then the run_main args.
# Reports wall, jvm cpu (bash `time` keyword — aggregates waited
# descendants; the `times` builtin in a subshell reads 0), ext cores.
cell() {
  local label="$1" tmo="$2"; shift 2
  tools/quiet_guard.sh || { say "$label refused: machine not quiet"; return 1; }
  say "$label start"
  local busy0 t0 rc t1 busy1 jvm
  busy0=$(busy_jiffies); t0=$(date +%s)
  TIMEFORMAT='%U %S'
  { time timeout "$tmo" tools/run_main.sh "$@" \
      > "/tmp/r16_${label// /_}.out" ; } 2> "/tmp/r16_${label// /_}.cputime"
  rc=$?
  t1=$(date +%s); busy1=$(busy_jiffies)
  jvm=$(awk '{print $1+$2}' "/tmp/r16_${label// /_}.cputime")
  grep '"metric"' "/tmp/r16_${label// /_}.out" | tee -a "$LOG"
  say "$label rc=$rc wall=$((t1-t0))s jvm_cpu=${jvm}s $(awk -v b0="$busy0" -v b1="$busy1" -v j="$jvm" -v w=$((t1-t0)) 'BEGIN{e=((b1-b0)/100-j)/w; if(e<0)e=0; printf "ext_cpu_cores=%.2f", e}')"
  return "$rc"
}

CELL="${1:?usage: r16_campaign.sh <probe|minhash head|minhash r12|simhash|semlsh|ivf_ab> }"; shift || true

# one flock window around whatever sequence the caller scripts; cells
# are also runnable one-by-one (each acquire-and-release).
# Inherited-lock escape hatch (r16 ADVICE): flock is exclusive across
# open file descriptions even within one process, so a wrapper that
# already holds the window CANNOT let each cell re-acquire — it exports
# CAMPAIGN_LOCK_HELD=1 instead and this script trusts the parent's lock.
if [ "${CAMPAIGN_LOCK_HELD:-0}" != 1 ]; then
  exec 9>>/tmp/graft_campaign.lock
  flock -n 9 || { say "refused: campaign window already open (flock)"; exit 1; }
  echo $$ > /tmp/graft_campaign.lock
fi

case "$CELL" in
  probe)
    RUN_MAIN_ERRF=/tmp/r16_probe.err \
      cell "probe" 900 graft.ThroughputBench /root/testdata/sf0.1
    ;;
  minhash)
    WHICH="${1:?minhash needs head|r12}"
    if [ "$WHICH" = r12 ]; then
      CP=/tmp/graft_r12_src/target/scala-2.13/classes
    else
      CP=/tmp/r16_head_cp
      rm -rf "$CP"; cp -a target/scala-2.13/classes "$CP"
      git rev-parse HEAD > "$CP/GIT_HEAD"
    fi
    say "minhash $WHICH classpath=$CP"
    SPARK_GRAFT_SF_DIR=/tmp/graft_x1000 SPARK_GRAFT_ONLY=dedup_minhash \
      SPARK_GRAFT_PASSES=1 SPARK_DRIVER_MEM=16g SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_JAVA_OPTS="$FREEZE_OPTS" RUN_MAIN_CP="$CP" \
      RUN_MAIN_ERRF="/tmp/r16_minhash_$WHICH.err" \
      cell "minhash_$WHICH" 14400 graft.Bench
    ;;
  simhash|semlsh)
    Q=dedup_simhash; [ "$CELL" = semlsh ] && Q=dedup_sem_lsh
    SPARK_GRAFT_SF_DIR=/tmp/graft_x1000 SPARK_GRAFT_ONLY="$Q" \
      SPARK_GRAFT_PASSES=1 SPARK_DRIVER_MEM=16g SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_JAVA_OPTS="$FREEZE_OPTS" \
      RUN_MAIN_ERRF="/tmp/r16_$CELL.err" \
      cell "$CELL" 7200 graft.Bench
    ;;
  ivf_ab)
    # 10k queries keeps the unhealed arm affordable (r15 ×100 lesson);
    # 16 GiB driver (8 GiB OOMs in the healed 32-task probe stage).
    # fallbackThreshold: rankTopK's partial TopK aggregate holds ONE
    # ~200 B buffer per query key, but ObjectHashAggregate falls back
    # to SORT-BASED aggregation above 128 distinct keys per task
    # (Spark default) — at ×1000 that sorts the entire 5e9-row
    # candidate stream to disk (~160 GB; the first attempt died
    # ENOSPC at 59 GB free). 128k keys ≈ 26 MB of TopK buffers —
    # trivially memory-safe, and both A/B arms share the conf.
    # IvfTopKAB's query slice is `vec_id % 1000 < nQueries/200`, i.e.
    # the ARG was calibrated for the ×100 corpus (200k vectors): the
    # selected count scales with corpus size. At ×1000 (2M vectors)
    # arg 1000 → vec_id%1000 < 5 → 10k actual queries (the verdict's
    # cell); the first attempt's arg 10000 selected 100k and its
    # healed wall (2018.7 s, no spill) is recorded as a capacity row.
    NQARG="${1:-1000}"
    SPARK_GRAFT_SF_DIR=/tmp/graft_x1000 SPARK_DRIVER_MEM=16g \
      SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_JAVA_OPTS="$FREEZE_OPTS -Dspark.sql.objectHashAggregate.sortBased.fallbackThreshold=131072" \
      RUN_MAIN_ERRF=/tmp/r16_ivf_ab.err \
      cell "ivf_ab" 21600 graft.dev.IvfTopKAB "$NQARG" 10 ab
    ;;
  *)
    say "unknown cell: $CELL"; exit 1
    ;;
esac
