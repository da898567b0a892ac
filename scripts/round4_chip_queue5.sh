#!/bin/bash
# Round-4 chip queue, part 5: phase-4 conditioning sweep on the calibrated
# 100-concept task. Strictly serial axon processes with settle sleeps
# (CLAUDE.md wedge lesson). One arm list in one process — the sweep script
# itself serializes arms in-process, which is wedge-safe.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
Q=/tmp/chip_queue.log
mark() { echo "=== $1 ===" >> "$Q"; date >> "$Q"; }

mark cal_phase4_sweep
sleep 45
PRESET=config3_cal ARMS=combo,c_gaux1,c_gaux3,c_nc2,c_gaux1_nc2,c_onehot,c_b128 \
  timeout 14000 python scripts/run_config3_stage1_sweep.py \
  > /tmp/cal_sweep_phase4.log 2>&1
echo "rc=$?" >> "$Q"

mark queue5_done
