#!/bin/bash
# Round-4 chip queue, part 4 (fresh session). Strictly serial axon
# processes with settle sleeps (CLAUDE.md wedge lesson: a client dialing
# within ~seconds of the previous client's exit can block forever on its
# first tunnel RPC).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
Q=/tmp/chip_queue.log
mark() { echo "=== $1 ===" >> "$Q"; date >> "$Q"; }

# 1. Compiled lane-layout verification (the scan_layout knob landed with
#    interpret-mode tests only; Mosaic rejects things interpret accepts).
mark verify_lane_fixed
timeout 1200 python /tmp/verify_lane.py > /tmp/verify_lane2.log 2>&1
echo "rc=$?" >> "$Q"

# 2. Guarded scan-variant timing (lane vs sublane vs tile/col-block sweep;
#    the bf16-acc probe is now guarded after the Mosaic rejection).
mark scan_variants_guarded
sleep 45
timeout 2400 python scripts/bench_scan_variants.py > /tmp/scan_variants2.log 2>&1
echo "rc=$?" >> "$Q"

# 3. Training roofline (VERDICT r3 #5).
mark train_roofline
sleep 45
timeout 1800 python scripts/bench_train_roofline.py > /tmp/roofline.log 2>&1
echo "rc=$?" >> "$Q"

mark queue4_done
