#!/bin/bash
# Watchdog sidecar: distinguish "wedged" from "busy but silent".
#
# The queue watchdogs (round5_chip_queue1{c,d}.sh) kill on log-mtime
# staleness alone. Measured false positive: the cotrain phase child spent
# 20+ min of pure host CPU (synthetic 100k-item database split generation)
# before its first log line — healthy, but one minute from a watchdog
# kill. The true wedge signature (CLAUDE.md) is ZERO CPU on the tunnel
# socket, so: every POLL seconds, sum utime+stime over all live python
# descendants of the given roots; if the total advanced by >= MIN_JIFFIES,
# touch the given logs (resetting the queue watchdog's stall clock). A
# real wedge advances ~nothing and still gets killed on schedule.
#
# Usage: round5_watchdog_sidecar.sh <root_pid>[,<root_pid>...] <log>[,...]
set -u
ROOTS=${1:?root pids (comma-separated)}
LOGS=${2:?log files (comma-separated)}
POLL=${POLL:-60}
MIN_JIFFIES=${MIN_JIFFIES:-30}

tree_cpu() {
  local total=0 p q stack
  stack=$(echo "$ROOTS" | tr ',' ' ')
  for p in $stack; do
    kill -0 "$p" 2>/dev/null || continue
    # breadth-first over descendants (exact PIDs via pgrep -P only)
    local frontier="$p"
    while [ -n "$frontier" ]; do
      local next=""
      for q in $frontier; do
        if [ -r "/proc/$q/stat" ]; then
          total=$((total + $(awk '{print $14 + $15}' "/proc/$q/stat" 2>/dev/null || echo 0)))
        fi
        next="$next $(pgrep -P "$q" 2>/dev/null | tr '\n' ' ')"
      done
      frontier=$(echo "$next" | tr -s ' ' | sed 's/^ //;s/ $//')
    done
  done
  echo "$total"
}

last=$(tree_cpu)
while true; do
  sleep "$POLL"
  # exit when every root is gone
  alive=0
  for p in $(echo "$ROOTS" | tr ',' ' '); do
    kill -0 "$p" 2>/dev/null && alive=1
  done
  [ "$alive" = 1 ] || exit 0
  cur=$(tree_cpu)
  if [ $((cur - last)) -ge "$MIN_JIFFIES" ]; then
    for l in $(echo "$LOGS" | tr ',' ' '); do
      [ -f "$l" ] && touch "$l"
    done
  fi
  last=$cur
done
