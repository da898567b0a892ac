#!/bin/bash
# Round-5 chip queue, part 1 — close the central-claim loop (VERDICT r4 #1/#4/#7):
#  (a) config3_cal scarce-2000 arms with the PROJECTION stage-I recipe at
#      full length (24k cycles): the round-4 conditioning fix (cond_acc 1.0
#      at 6k-cycle probes) carried into the experiment it was built for.
#      Plus a fake_pair_weight=0.5 cotrain sub-arm reusing the SAME stage-I
#      checkpoint (the knob built for imperfect-conditioning label noise).
#  (b) a second scarcity point (1000) to bracket the crossover.
#  (c) full-split stage-I convergence run (does W settle / cond_acc hold /
#      entropy stay healthy at 24k cycles) — VERDICT #4.
#  (d) config2_cal scarce-1000 arms: the easier 32px one-hot direction —
#      VERDICT #7.
# Strictly serial with settle sleeps (CLAUDE.md serial-dial wedge).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
Q=/tmp/chip_queue_r5.log
mark() { echo "=== $1 ===" >> "$Q"; date >> "$Q"; }

# The round-4 sweep winner (c_proj_gaux3): projection critic + G aux weight
# 3 on top of the convergence triple (gp100 + staged widths + aux-on-fake).
PROJ_GAN='{"gp_lambda": 100.0, "dim": 64, "g_width_mults": [8, 8, 4, 2, 1], "d_width_mults": [1, 2, 4, 8, 8], "acgan_fake_scale": 1.0, "d_projection": true, "acgan_scale_g": 3.0}'
# 32px variant for config2_cal: keep the proven 32px geometry (constant
# width dim 128, gp_lambda 10) and add the conditioning fix only.
PROJ_GAN_32='{"acgan_fake_scale": 1.0, "d_projection": true, "acgan_scale_g": 3.0}'

RUNS=/root/repo/runs

mark scarce2000_proj_stage1
sleep 45
CONFIG_PRESET=config3_cal SCARCE_TRAIN=2000 RUN_TAG=proj PHASES=stage1 \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
  GAN_JSON="$PROJ_GAN" \
  timeout 7200 python scripts/run_config3_ref_horizon.py \
  > /tmp/r5_scarce2000_stage1.log 2>&1
echo "rc=$?" >> "$Q"

# Reuse the finished stage-I for the fake_pair_weight sub-arm: copy the
# checkpoint (encoder still at step 0) before any encoder phase touches it.
mark fpw05_ckpt_copy
SRC=$RUNS/config3_ref_horizon_cal_scarce2000_proj/cotrain
DST=$RUNS/config3_ref_horizon_cal_scarce2000_proj_fpw05/cotrain
mkdir -p "$DST"
cp -r "$SRC/checkpoints" "$DST/" 2>>"$Q" && \
  cp "$SRC/data_provenance.json" "$DST/" 2>>"$Q"
echo "copy rc=$?" >> "$Q"

mark scarce2000_proj_enc_arms
sleep 45
CONFIG_PRESET=config3_cal SCARCE_TRAIN=2000 RUN_TAG=proj \
  PHASES=cotrain,realonly \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
  GAN_JSON="$PROJ_GAN" \
  timeout 7200 python scripts/run_config3_ref_horizon.py \
  > /tmp/r5_scarce2000_enc.log 2>&1
echo "rc=$?" >> "$Q"

mark scarce2000_fpw05_cotrain
sleep 45
CONFIG_PRESET=config3_cal SCARCE_TRAIN=2000 RUN_TAG=proj_fpw05 \
  PHASES=cotrain \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
  GAN_JSON="$PROJ_GAN" TRAIN_JSON='{"fake_pair_weight": 0.5}' \
  timeout 4800 python scripts/run_config3_ref_horizon.py \
  > /tmp/r5_scarce2000_fpw05.log 2>&1
echo "rc=$?" >> "$Q"

mark scarce1000_proj_full
sleep 45
CONFIG_PRESET=config3_cal SCARCE_TRAIN=1000 RUN_TAG=proj \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
  GAN_JSON="$PROJ_GAN" \
  timeout 10800 python scripts/run_config3_ref_horizon.py \
  > /tmp/r5_scarce1000.log 2>&1
echo "rc=$?" >> "$Q"

mark config2cal_scarce1000
sleep 45
CONFIG_PRESET=config2_cal SCARCE_TRAIN=1000 RUN_TAG=proj \
  ENCODER_ARCH=small_cnn \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
  GAN_JSON="$PROJ_GAN_32" \
  timeout 7200 python scripts/run_config3_ref_horizon.py \
  > /tmp/r5_c2cal_scarce1000.log 2>&1
echo "rc=$?" >> "$Q"

mark scarce4000_proj_full
sleep 45
CONFIG_PRESET=config3_cal SCARCE_TRAIN=4000 RUN_TAG=proj \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
  GAN_JSON="$PROJ_GAN" \
  timeout 10800 python scripts/run_config3_ref_horizon.py \
  > /tmp/r5_scarce4000.log 2>&1
echo "rc=$?" >> "$Q"

mark fullsplit_stage1_convergence
sleep 45
CONFIG_PRESET=config3_cal RUN_TAG=projconv PHASES=stage1 \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 \
  GAN_JSON="$PROJ_GAN" \
  timeout 7200 python scripts/run_config3_ref_horizon.py \
  > /tmp/r5_fullsplit_stage1.log 2>&1
echo "rc=$?" >> "$Q"

mark queue1_done
