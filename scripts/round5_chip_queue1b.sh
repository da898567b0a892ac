#!/bin/bash
# Round-5 chip queue 1b — takeover orchestrator. The original queue1 bash
# was retired mid-flight (its stage1 child kept running; we wait on it via
# $1) so the fused-rescan bench A/B could move up from "after everything"
# to "after stage1": it doubles as the compiled-kernel verification and
# the tunnel-health canary between long experiments.
# Order: [in-flight stage1] -> bench A/B -> scarce2000 enc arms + fpw05
# (VERDICT r4 #1) -> scarce1000 -> config2_cal scarce (#7) -> scarce4000
# -> fullsplit stage1 convergence (#4).
# Strictly serial with settle sleeps (CLAUDE.md serial-dial wedge).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
Q=/tmp/chip_queue_r5.log
mark() { echo "=== $1 ===" >> "$Q"; date >> "$Q"; }

PROJ_GAN='{"gp_lambda": 100.0, "dim": 64, "g_width_mults": [8, 8, 4, 2, 1], "d_width_mults": [1, 2, 4, 8, 8], "acgan_fake_scale": 1.0, "d_projection": true, "acgan_scale_g": 3.0}'
PROJ_GAN_32='{"acgan_fake_scale": 1.0, "d_projection": true, "acgan_scale_g": 3.0}'
RUNS=/root/repo/runs

if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi
mark stage1_child_exited

# Copy the finished stage-I checkpoint for the fake_pair_weight sub-arm
# BEFORE any encoder phase extends the cotrain dir.
mark fpw05_ckpt_copy
SRC=$RUNS/config3_ref_horizon_cal_scarce2000_proj/cotrain
DST=$RUNS/config3_ref_horizon_cal_scarce2000_proj_fpw05/cotrain
mkdir -p "$DST"
cp -r "$SRC/checkpoints" "$DST/" 2>>"$Q" && \
  cp "$SRC/data_provenance.json" "$DST/" 2>>"$Q"
echo "copy rc=$?" >> "$Q"

mark bench_fused_ab
sleep 60
timeout 3600 python bench.py > /tmp/r5_bench_fused.json 2> /tmp/r5_bench_fused.err
echo "bench rc=$?" >> "$Q"

mark scarce2000_proj_enc_arms
sleep 60
CONFIG_PRESET=config3_cal SCARCE_TRAIN=2000 RUN_TAG=proj \
  PHASES=cotrain,realonly \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
  GAN_JSON="$PROJ_GAN" \
  timeout 7200 python scripts/run_config3_ref_horizon.py \
  > /tmp/r5_scarce2000_enc.log 2>&1
echo "rc=$?" >> "$Q"

mark scarce2000_fpw05_cotrain
sleep 60
CONFIG_PRESET=config3_cal SCARCE_TRAIN=2000 RUN_TAG=proj_fpw05 \
  PHASES=cotrain \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
  GAN_JSON="$PROJ_GAN" TRAIN_JSON='{"fake_pair_weight": 0.5}' \
  timeout 4800 python scripts/run_config3_ref_horizon.py \
  > /tmp/r5_scarce2000_fpw05.log 2>&1
echo "rc=$?" >> "$Q"

mark scarce1000_proj_full
sleep 60
CONFIG_PRESET=config3_cal SCARCE_TRAIN=1000 RUN_TAG=proj \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
  GAN_JSON="$PROJ_GAN" \
  timeout 10800 python scripts/run_config3_ref_horizon.py \
  > /tmp/r5_scarce1000.log 2>&1
echo "rc=$?" >> "$Q"

mark config2cal_scarce1000
sleep 60
CONFIG_PRESET=config2_cal SCARCE_TRAIN=1000 RUN_TAG=proj \
  ENCODER_ARCH=small_cnn \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
  GAN_JSON="$PROJ_GAN_32" \
  timeout 7200 python scripts/run_config3_ref_horizon.py \
  > /tmp/r5_c2cal_scarce1000.log 2>&1
echo "rc=$?" >> "$Q"

mark scarce4000_proj_full
sleep 60
CONFIG_PRESET=config3_cal SCARCE_TRAIN=4000 RUN_TAG=proj \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
  GAN_JSON="$PROJ_GAN" \
  timeout 10800 python scripts/run_config3_ref_horizon.py \
  > /tmp/r5_scarce4000.log 2>&1
echo "rc=$?" >> "$Q"

mark fullsplit_stage1_convergence
sleep 60
CONFIG_PRESET=config3_cal RUN_TAG=projconv PHASES=stage1 \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 \
  GAN_JSON="$PROJ_GAN" \
  timeout 7200 python scripts/run_config3_ref_horizon.py \
  > /tmp/r5_fullsplit_stage1.log 2>&1
echo "rc=$?" >> "$Q"

mark queue1b_done
