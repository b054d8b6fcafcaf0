#!/bin/bash
# Machine-quietness gate (round-12 campaign hygiene, r11 verdict #7).
#
# The r11 recorded bench ran under a 29-core campaign JVM and certified
# itself clean (pass_noise only sees pass-to-pass spread). Bench.scala
# now carries an in-artifact external-CPU tripwire; this script is the
# PROCEDURAL half: refuse to start a measured job at all when the
# machine is not quiet.
#
# Usage:
#   tools/quiet_guard.sh            exit 0 = quiet, 1 = busy
#   tools/quiet_guard.sh --bench    additionally refuse while a campaign
#                                   window is open (/tmp/graft_campaign.lock
#                                   held by a live pid) — the recorded
#                                   bench must never run inside one
#
# Detection is pgrep -af on a java-binary anchor (bare `java` OR an
# absolute .../bin/java — sbt and wrappers launch the latter) + a
# graft-main match on the SAME line. Never `pkill -f <class>`: the
# round driver's CLI process contains the class names in its prompt
# text and matches too (r11 lesson).
set -u
busy=$(pgrep -af "^([^ ]*/)?java " | grep -E "graft\.[A-Za-z0-9.]+" || true)
if [ -n "$busy" ]; then
  echo "quiet_guard: REFUSING - graft JVM(s) alive:" >&2
  echo "$busy" | awk '{printf "  pid %s: %s\n", $1, $NF}' >&2
  exit 1
fi
if [ "${1:-}" = "--bench" ] && [ -f /tmp/graft_campaign.lock ]; then
  # flock-held window (r13+): the kernel releases the lock on holder
  # death, so there is no stale state and nothing to rm — the r12
  # rm-then-recreate dance was itself a TOCTOU (two starters observing
  # a dead pid could each rm, the second deleting the first's fresh
  # lock). The probe acquires-and-releases; the real mutual exclusion
  # is the caller (recorded_bench.sh) HOLDING the flock for its run.
  if ! flock -n /tmp/graft_campaign.lock -c true 2>/dev/null; then
    echo "quiet_guard: REFUSING - campaign window open (flock held)" >&2
    exit 1
  fi
  # The legacy pid-content check (r11/r12 campaign scripts wrote $$
  # into the file) is GONE (r13 advice): after OS pid reuse by any
  # unrelated long-lived process it falsely refused every recorded
  # bench until the file was hand-cleaned. Every live campaign script
  # (r13+) HOLDS the flock for its window, so the flock probe above is
  # the complete gate; pid bytes left in the file are inert.
fi
exit 0
