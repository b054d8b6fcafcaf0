#!/bin/bash
# Round-13 campaign. One real cell: the r12 verdict's #1 — measure the
# ×1000 sim_join at the NEW enumerate shape (explicit bucket-key
# repartition, auto width 256 on local[32]) against the completed r11
# baseline row (26,952.3 s / 1,109,301,980 pairs at the old 32-wide
# shape). The ~25% tail win is a projection until this lands; the
# reproduction bar is pairs EQUAL bit-for-bit.
#
# Hygiene (r12 advice applied):
#   - campaign window held with flock(2) on a persistent fd — the
#     kernel releases it on process death, so there is no stale-lock
#     state and no rm+create TOCTOU (two starters can never both win);
#   - quiet_guard before the cell;
#   - classpath FROZEN to a snapshot dir so later sbt compiles cannot
#     swap lazily-loaded classes mid-run (r12 md5-audited 69 class
#     files per compile instead);
#   - the run self-reports its external-CPU average (same /proc/stat
#     arithmetic as Bench's in-artifact co-load gate) so the recorded
#     wall carries its own quietness evidence.
# Usage: tools/r13_campaign.sh simjoin_x1000_newshape
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r13_campaign.log
say() { echo "[$(date +%T)] $*" | tee -a "$LOG"; }

tools/quiet_guard.sh || { say "cell refused: machine not quiet"; exit 1; }
exec 9>>/tmp/graft_campaign.lock
flock -n 9 || { say "cell refused: campaign window already open (flock)"; exit 1; }
echo $$ > /tmp/graft_campaign.lock   # diagnostics + legacy pid readers

busy_jiffies() { awk '/^cpu /{print $2+$3+$4+$7+$8+$9; exit}' /proc/stat; }
# JVM user+sys CPU via bash's `time` KEYWORD (no /usr/bin/time on this
# box). NOT the `times` builtin in a pipeline/substitution — a forked
# subshell's tms_cutime starts at ZERO, so that always reports 0 and
# the ext-cores line would charge the measured JVM's own CPU to the
# machine (verified live in the r13 review). The keyword runs in the
# current shell and aggregates waited descendants.

CELL="${1:?usage: r13_campaign.sh <cell>}"; shift
case "$CELL" in
  simjoin_x1000_newshape)
    SNAP=/tmp/r13_launch_cp
    rm -rf "$SNAP"; cp -a target/scala-2.13/classes "$SNAP"
    git rev-parse HEAD > "$SNAP/GIT_HEAD"
    say "simjoin_x1000_newshape start (timeout 8h, frozen cp=$SNAP @ $(cat "$SNAP/GIT_HEAD"))"
    busy0=$(busy_jiffies); t0=$(date +%s)
    TIMEFORMAT='%U %S'
    { time SPARK_GRAFT_SF_DIR=/tmp/graft_x1000 RUN_MAIN_ERRF=/tmp/r13_simjoin.err \
        RUN_MAIN_CP="$SNAP" \
        timeout 28800 tools/run_main.sh graft.dev.SimJoinAB 0 \
        > /tmp/r13_simjoin.out ; } 2> /tmp/r13_simjoin.cputime
    rc=$?
    tee -a "$LOG" < /tmp/r13_simjoin.out
    t1=$(date +%s); busy1=$(busy_jiffies)
    jvm=$(awk '{print $1+$2}' /tmp/r13_simjoin.cputime)
    say "simjoin_x1000_newshape rc=$rc wall=$((t1-t0))s jvm_cpu=${jvm}s $(awk -v b0="$busy0" -v b1="$busy1" -v j="$jvm" -v w=$((t1-t0)) 'BEGIN{e=((b1-b0)/100-j)/w; if(e<0)e=0; printf "ext_cpu_cores=%.2f", e}')"
    exit "$rc"
    ;;
  *)
    say "unknown cell: $CELL"; exit 1
    ;;
esac
