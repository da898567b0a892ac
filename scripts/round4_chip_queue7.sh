#!/bin/bash
# Round-4 chip queue, part 7:
#  (a) phase-5 conditioning probes on config3_cal at a doubled budget —
#      the phase-4 winner acgan_scale_g=3 had cond_acc still climbing at
#      3k cycles; escalate the weight (10) and probe the projection
#      critic (d_projection), the architectural conditioning route.
#  (b) multi-seed bit sweep (seeds 1, 2 at the 50k budget) — the round-4
#      re-measurement showed single-seed width comparisons are
#      noise-dominated at this geometry.
# Strictly serial with settle sleeps (CLAUDE.md serial-dial wedge).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
Q=/tmp/chip_queue.log
mark() { echo "=== $1 ===" >> "$Q"; date >> "$Q"; }

mark phase5_probes
sleep 45
PRESET=config3_cal PROBE_CYCLES=6000 ARMS=c_gaux3,c_gaux10,c_proj,c_proj_gaux3 \
  timeout 7200 python scripts/run_config3_stage1_sweep.py \
  > /tmp/cal_sweep_phase5.log 2>&1
echo "rc=$?" >> "$Q"

mark bit_sweep_seed1
sleep 45
ITERS=50000 SEED=1 SWEEP_TAG=50k_s1 timeout 7200 \
  python scripts/run_bit_sweep.py > /tmp/bit_sweep_50k_s1.log 2>&1
echo "rc=$?" >> "$Q"

mark bit_sweep_seed2
sleep 45
ITERS=50000 SEED=2 SWEEP_TAG=50k_s2 timeout 7200 \
  python scripts/run_bit_sweep.py > /tmp/bit_sweep_50k_s2.log 2>&1
echo "rc=$?" >> "$Q"

mark queue7_done
