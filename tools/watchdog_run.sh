#!/usr/bin/env bash
# watchdog_run.sh LOGFILE STALL_SECS MAX_RESTARTS TOTAL_TIMEOUT -- cmd...
#
# Runs `cmd` with stdout/stderr appended to LOGFILE and restarts it (up
# to MAX_RESTARTS times) whenever the log goes quiet for STALL_SECS —
# the axon TPU tunnel can wedge a device call indefinitely (observed:
# 19 min dead after an orbax checkpoint save, round 4), and a wedged
# run holds the only chip. The wrapped tool must be resumable (e.g.
# tools/window_study.py skips rows already in its incremental JSON;
# tools/soak_train.py --resume restores the last checkpoint).
#
# Kills by exact PID only (never by pattern).
set -u
LOG="$1"; STALL="$2"; MAXR="$3"; TOTAL="$4"; shift 4
[ "$1" = "--" ] && shift
deadline=$(( $(date +%s) + TOTAL ))
restarts=0
while :; do
  "$@" >> "$LOG" 2>&1 &
  pid=$!
  echo "watchdog: started pid=$pid (restart #$restarts)" >> "$LOG"
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    now=$(date +%s)
    if [ "$now" -gt "$deadline" ]; then
      echo "watchdog: total budget exhausted; killing $pid" >> "$LOG"
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
      exit 124
    fi
    mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    if [ $(( now - mt )) -gt "$STALL" ]; then
      echo "watchdog: log quiet ${STALL}s; killing wedged pid=$pid" >> "$LOG"
      # kill the whole subtree by walking children (exact PIDs)
      for c in $(ps -o pid= --ppid "$pid" 2>/dev/null); do
        for g in $(ps -o pid= --ppid "$c" 2>/dev/null); do
          kill -9 "$g" 2>/dev/null
        done
        kill -9 "$c" 2>/dev/null
      done
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid" 2>/dev/null
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "watchdog: command exited rc=0" >> "$LOG"
    exit 0
  fi
  restarts=$(( restarts + 1 ))
  if [ "$restarts" -gt "$MAXR" ]; then
    echo "watchdog: rc=$rc after $MAXR restarts; giving up" >> "$LOG"
    exit "$rc"
  fi
  echo "watchdog: rc=$rc; restarting in 20s" >> "$LOG"
  sleep 20
done
