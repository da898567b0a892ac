#!/bin/bash
# Round-4 chip queue, part 2 (resumed session). ONE axon process at a
# time (CLAUDE.md): strictly serial. Each job logs to /tmp and appends a
# marker line to /tmp/chip_queue.log.
#
# WEDGE LESSON (measured twice this round): an axon client that dials
# within ~seconds of the previous client's exit can block forever on its
# first tunnel RPC (child sleeping at ~0% CPU, log stuck after the
# platform warning — scarce4000 04:31, cal_scarce2000 07:41, the latter
# 6s after a crashed harness exited). The tunnel recovers once the wedged
# client is killed; a settle sleep between processes avoids it. The
# orchestrating runners spawn their own children back-to-back without
# incident ONCE the first child is healthy, so only fresh dials after a
# foreign process need the breather.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
Q=/tmp/chip_queue.log
mark() { echo "=== $1 ===" >> "$Q"; date >> "$Q"; }

sleep 60   # settle after the killed wedge

# 1. The headline experiment: config3 scarce arms on the CALIBRATED
#    100-concept task (the 21-concept default saturates both arms even at
#    SCARCE_TRAIN=2000 — measured this round). Stage-I winners triple from
#    runs/config3_stage1_sweep.
WINNERS='{"gp_lambda": 100.0, "dim": 64, "g_width_mults": [8, 8, 4, 2, 1], "d_width_mults": [1, 2, 4, 8, 8], "acgan_fake_scale": 1.0}'
mark cal_scarce2000_retry
CONFIG_PRESET=config3_cal SCARCE_TRAIN=2000 GAN_CYCLES=24000 ENC_ITERS=50000 \
  GAN_JSON="$WINNERS" \
  python scripts/run_config3_ref_horizon.py > /tmp/cal_scarce2000.log 2>&1
echo "rc=$?" >> "$Q"

# 2. Training roofline (VERDICT r3 #5) — short.
mark train_roofline
sleep 30
timeout 1800 python scripts/bench_train_roofline.py > /tmp/roofline.log 2>&1
echo "rc=$?" >> "$Q"

mark queue2_done
