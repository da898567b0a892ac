#!/bin/bash
# Round-5 chip queue, part 2 — fused-rescan kernel verification + bench
# with phase variance bands (VERDICT r4 #5/#6).
#
# Waits for queue1 (PID file) to exit, settles the tunnel (CLAUDE.md
# serial-dial wedge), then runs bench.py: the round-5 bench measures BOTH
# exact engines (production + rescan_fused) with full-batch sort-engine
# witnesses and >=5-repeat phase spreads, so one run is simultaneously the
# compiled-kernel exactness drive and the A/B measurement.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
Q=/tmp/chip_queue_r5.log

if [ -f /tmp/queue1.pid ]; then
  while kill -0 "$(cat /tmp/queue1.pid)" 2>/dev/null; do sleep 60; done
fi
echo "=== queue2: bench fused-rescan A/B ===" >> "$Q"; date >> "$Q"
sleep 60
timeout 3600 python bench.py > /tmp/r5_bench_fused.json 2> /tmp/r5_bench_fused.err
echo "bench rc=$?" >> "$Q"
echo "=== queue2 done ===" >> "$Q"; date >> "$Q"
