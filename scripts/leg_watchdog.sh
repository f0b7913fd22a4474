#!/bin/bash
# Tunnel-stall watchdog: if the newest r5b leg log hasn't grown for
# STALL_SECS, SIGTERM the EXACT accuracy_proxy train PID (never
# pattern-kill) so the queue's retry resumes from the last checkpoint.
# CLAUDE.md r4: a stalled leg's SIGTERM does not wedge the device.
STALL_SECS=${STALL_SECS:-600}
while true; do
  sleep 60
  log=$(ls -t /tmp/r5b_leg*.log 2>/dev/null | head -1)
  [ -z "$log" ] && continue
  age=$(( $(date +%s) - $(stat -c %Y "$log") ))
  if [ "$age" -gt "$STALL_SECS" ]; then
    # exact-PID kill: the single QUEUE train process (--leg_until is
    # passed only by queue legs — r5 incident: the watchdog killed a
    # manually-launched fine-tune twice because the stale-log check
    # matched the finished queue's logs while ANY train process ran)
    pid=$(ps -eo pid,args | grep "python -u scripts/accuracy_proxy.py train" \
          | grep -- "--leg_until" \
          | grep -v grep | grep -v timeout | awk '{print $1}' | head -1)
    if [ -n "$pid" ]; then
      echo "$(date +%H:%M:%S) watchdog: $log stale ${age}s — kill $pid" \
        >> /tmp/r5b_watchdog.log
      kill "$pid"
      sleep 120   # let the queue restart before re-checking
    fi
  fi
done
