#!/bin/bash
# Stall watchdog for the __run_4param__ production run (round-4 playbook,
# WALKTHROUGH.md "recovering a stalled run": the chip's client can stall
# silently — ~1% CPU, no error, no log growth — and the fix is kill the
# exact PID, wait 10 s, rerun the same command, which resumes from the
# checkpoint). This automates exactly that. Kills only the PID it
# launched/adopted (never pattern-matched).
#
# usage: watchdog_4param.sh [adopt_pid]
cd /root/repo
LOG=__run_4param__/hmc_r5.log
WLOG=__run_4param__/watchdog.log
OUT=__run_4param__/post_4param.npz
STALL_AGE=${STALL_AGE:-1200}   # s without log growth AND idle client = stall
MAX_RESTARTS=${MAX_RESTARTS:-8}
PID=${1:-}
restarts=0

note() { echo "$(date -u +%FT%T) $*" >> "$WLOG"; }

launch() {
  # launch.sh ends in `exec python`, so $! IS the python client's PID
  bash __run_4param__/launch.sh >> "$LOG" 2>&1 &
  PID=$!
  note "launched pid $PID (restart $restarts)"
}

[ -z "$PID" ] && launch
note "watchdog up, watching pid $PID"

while true; do
  sleep 60
  if [ -f "$OUT" ]; then
    note "output $OUT exists; run complete"
    exit 0
  fi
  if ! kill -0 "$PID" 2>/dev/null; then
    restarts=$((restarts + 1))
    if [ "$restarts" -gt "$MAX_RESTARTS" ]; then
      note "pid $PID dead; restart budget exhausted"
      exit 1
    fi
    note "pid $PID dead without output; relaunching in 10 s"
    sleep 10
    launch
    continue
  fi
  age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
  cpu=$(ps -o pcpu= -p "$PID" 2>/dev/null | tr -d ' ' | cut -d. -f1)
  if [ "$age" -gt "$STALL_AGE" ] && [ "${cpu:-0}" -lt 5 ]; then
    restarts=$((restarts + 1))
    if [ "$restarts" -gt "$MAX_RESTARTS" ]; then
      note "stall detected but restart budget exhausted"
      exit 1
    fi
    note "silent stall: log age ${age}s, cpu ${cpu}%; killing pid $PID"
    for child in $(ps -o pid= --ppid "$PID" 2>/dev/null); do
      kill -9 "$child" 2>/dev/null
    done
    kill -9 "$PID" 2>/dev/null
    sleep 10
    launch
  fi
done
