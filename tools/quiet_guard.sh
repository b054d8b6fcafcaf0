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
  pid=$(cat /tmp/graft_campaign.lock 2>/dev/null || echo "")
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
    echo "quiet_guard: REFUSING - campaign window open (lock pid $pid alive)" >&2
    exit 1
  fi
  # stale lock (owner dead): clear it and proceed
  rm -f /tmp/graft_campaign.lock
fi
exit 0
