#!/bin/bash
# Round-4 chip queue, part 6: fresh bit sweep at a converged budget
# (VERDICT r3 #7 — round-3 checkpoints were wiped with the VM).
# Waits for queue5 (phase-4 conditioning sweep) to finish, then runs
# strictly serially with settle sleeps (CLAUDE.md wedge lesson).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
Q=/tmp/chip_queue.log
mark() { echo "=== $1 ===" >> "$Q"; date >> "$Q"; }

# Wait for queue5's completion marker (poll, no tunnel contact).
while ! grep -q queue5_done "$Q"; do sleep 60; done

mark bit_sweep_50k
sleep 60
ITERS=50000 SWEEP_TAG=50k timeout 14000 \
  python scripts/run_bit_sweep.py > /tmp/bit_sweep_50k.log 2>&1
echo "rc=$?" >> "$Q"

mark bit_sweep_48_100k
sleep 60
BITS=48 ITERS=100000 SWEEP_TAG=100k timeout 10000 \
  python scripts/run_bit_sweep.py > /tmp/bit_sweep_48_100k.log 2>&1
echo "rc=$?" >> "$Q"

mark queue6_done
