#!/bin/bash
# Round-4 chip queue, part 3: launch AFTER round4_chip_queue2.sh finishes
# (ONE axon process at a time). Fixed scan-variant harness re-run + the
# fresh honest bit sweep (round-3 checkpoints were wiped with the VM).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
Q=/tmp/chip_queue.log
mark() { echo "=== $1 ===" >> "$Q"; date >> "$Q"; }

# 10s breather between axon processes: the one observed wedge (scarce4000,
# 2026-08-19 04:31) started 6s after the previous child exited — suspected
# tunnel-release race.
mark scan_variants_fixed
sleep 10
timeout 2400 python scripts/bench_scan_variants.py > /tmp/scan_variants2.log 2>&1
echo "rc=$?" >> "$Q"

mark bit_sweep_50k
sleep 10
ITERS=50000 timeout 4000 python scripts/run_bit_sweep.py > /tmp/bit_sweep50k.log 2>&1
echo "rc=$?" >> "$Q"

# The continuation reuses ROOT and would overwrite the 4-point artifacts:
# archive the 50k slice first.
for f in sweep.json sweep.md point_bits48.json; do
  cp "runs/bit_sweep/$f" "runs/bit_sweep/50k_$f" 2>/dev/null
done

mark bit48_to_100k
sleep 10
ITERS=100000 BITS=48 timeout 2400 python scripts/run_bit_sweep.py > /tmp/bit48_100k.log 2>&1
echo "rc=$?" >> "$Q"

mark queue3_done
