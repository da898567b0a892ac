#!/bin/bash
# Round-5 chip queue 6 (reordered mid-session; replaces the first draft and
# folds in queue7's backfill) — post-scarce4000-triple chip items in VALUE
# order, each room-gated so a started item can finish:
#   1. config2_cal scarce1000 fpw05 with class_balance_mode="mass" — the
#      measured 0.350 collapse re-run with the fix; same stage-I ckpt and
#      data order, the only change is HASH_JSON. (~12 min)
#   2. scarce4000 fpw05 backfill (if queue5's own room gate skipped it) —
#      completes the fake_pair_weight=0.5 curve at {1000, 2000, 4000}.
#   3. config3_cal scarce1000 fpw05 "mass" A/B — measures the docs' claim
#      that the count-mode interaction is marginal on multi-label. (~35 min)
#   4. scarce1000 fpw075 — third point on the discount curve (least
#      valuable; expected to be room-skipped).
#
# Usage: HARD_END=<epoch> bash round5_chip_queue6.sh
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
Q=/tmp/chip_queue_r5.log
STALL=${STALL:-1500}
HARD_END=${HARD_END:?set HARD_END epoch}
RUNS=/root/repo/runs
mark() { echo "=== $1 ===" >> "$Q"; date >> "$Q"; }

room_ok() {
  local now room
  now=$(date +%s); room=$((HARD_END - now))
  if [ "$room" -lt "$2" ]; then
    mark "SKIP $1 (room ${room}s < need $2s)"; return 1
  fi
  return 0
}

kill_tree() {  # exact-PID, depth-first; never by pattern
  local p c g
  for p in "$@"; do
    for c in $(pgrep -P "$p"); do
      for g in $(pgrep -P "$c"); do kill -9 "$g" 2>/dev/null; done
      kill -9 "$c" 2>/dev/null
    done
    kill -9 "$p" 2>/dev/null
  done
}

run_watch() {
  local log=$1 tmo=$2; shift 2
  local try rc pid now m start room
  for try in 1 2 3; do
    now=$(date +%s)
    room=$((HARD_END - now))
    if [ "$room" -le 120 ]; then
      mark "HARD_END reached, abandoning $log"
      return 1
    fi
    [ "$tmo" -gt "$room" ] && tmo=$room
    : > "$log"
    timeout "$tmo" "$@" >> "$log" 2>&1 &
    pid=$!
    start=$(date +%s)
    rc=
    while true; do
      if ! kill -0 "$pid" 2>/dev/null; then
        wait "$pid"; rc=$?; break
      fi
      now=$(date +%s)
      m=$(stat -c %Y "$log" 2>/dev/null || echo "$start")
      if [ $((now - m)) -gt "$STALL" ] && [ $((now - start)) -gt "$STALL" ]; then
        echo "WATCHDOG stall try=$try $log" >> "$Q"; date >> "$Q"
        kill_tree "$pid"
        wait "$pid" 2>/dev/null
        rc=99; break
      fi
      sleep 30
    done
    echo "rc=$rc try=$try $log" >> "$Q"
    [ "$rc" = "0" ] && return 0
    if [ "$rc" != "99" ] && [ "$rc" != "124" ]; then return "$rc"; fi
    sleep 75
  done
  return 1
}

PROJ_GAN='{"gp_lambda": 100.0, "dim": 64, "g_width_mults": [8, 8, 4, 2, 1], "d_width_mults": [1, 2, 4, 8, 8], "acgan_fake_scale": 1.0, "d_projection": true, "acgan_scale_g": 3.0}'
PROJ_GAN_32='{"acgan_fake_scale": 1.0, "d_projection": true, "acgan_scale_g": 3.0}'

seed_fpw() {
  local src=$RUNS/$1/cotrain dst=$RUNS/$2/cotrain
  [ -d "$src/checkpoints/24000" ] || { mark "seed_fpw: no $1 stage-I ckpt"; return 1; }
  mkdir -p "$dst/checkpoints"
  cp -r "$src/checkpoints/24000" "$dst/checkpoints/" && \
    cp "$src/data_provenance.json" "$dst/" 2>>"$Q"
}

# ---- wait for queue5 to drain (it owns the tunnel until then)
QPID=$(cat /tmp/queue5.pid 2>/dev/null || echo "")
if [ -n "$QPID" ]; then
  while kill -0 "$QPID" 2>/dev/null; do sleep 20; done
fi
mark queue6_start
sleep 75

# 1. the collapse re-run with the fix (~12 min measured for the count twin)
room_ok c2cal_fpw05_mass 2400 && \
  seed_fpw config3_ref_horizon_config2_cal_scarce1000_proj \
           config3_ref_horizon_config2_cal_scarce1000_proj_fpw05mass && {
mark c2cal_scarce1000_fpw05_MASS_cotrain
CONFIG_PRESET=config2_cal SCARCE_TRAIN=1000 RUN_TAG=proj_fpw05mass \
  PHASES=cotrain ENCODER_ARCH=small_cnn \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
  GAN_JSON="$PROJ_GAN_32" TRAIN_JSON='{"fake_pair_weight": 0.5}' \
  HASH_JSON='{"class_balance_mode": "mass"}' \
  run_watch /tmp/r5_c2cal_fpw05_mass.log 3600 \
  python scripts/run_config3_ref_horizon.py
}

# 2. scarce4000 fpw05 backfill (no-op if queue5 fit it)
if [ -f "$RUNS/config3_ref_horizon_cal_scarce4000_proj_fpw05/summary.json" ]; then
  mark "queue6: scarce4000 fpw05 already done by queue5"
else
  room_ok scarce4000_fpw05_backfill 2400 && \
    seed_fpw config3_ref_horizon_cal_scarce4000_proj \
             config3_ref_horizon_cal_scarce4000_proj_fpw05 && {
  mark scarce4000_fpw05_cotrain_q6
  sleep 75
  CONFIG_PRESET=config3_cal SCARCE_TRAIN=4000 RUN_TAG=proj_fpw05 \
    PHASES=cotrain \
    GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
    GAN_JSON="$PROJ_GAN" TRAIN_JSON='{"fake_pair_weight": 0.5}' \
    run_watch /tmp/r5_scarce4000_fpw05_q6.log 3600 \
    python scripts/run_config3_ref_horizon.py
  }
fi

# 3. multi-label mass A/B (~33 min measured for the count twin)
room_ok scarce1000_fpw05_mass 3600 && \
  seed_fpw config3_ref_horizon_cal_scarce1000_proj \
           config3_ref_horizon_cal_scarce1000_proj_fpw05mass && {
mark scarce1000_fpw05_MASS_cotrain
sleep 75
CONFIG_PRESET=config3_cal SCARCE_TRAIN=1000 RUN_TAG=proj_fpw05mass \
  PHASES=cotrain \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
  GAN_JSON="$PROJ_GAN" TRAIN_JSON='{"fake_pair_weight": 0.5}' \
  HASH_JSON='{"class_balance_mode": "mass"}' \
  run_watch /tmp/r5_scarce1000_fpw05_mass.log 4800 \
  python scripts/run_config3_ref_horizon.py
}

# 4. discount-curve intermediate point (expected room-skipped)
room_ok scarce1000_fpw075 3600 && \
  seed_fpw config3_ref_horizon_cal_scarce1000_proj \
           config3_ref_horizon_cal_scarce1000_proj_fpw075 && {
mark scarce1000_fpw075_cotrain
sleep 75
CONFIG_PRESET=config3_cal SCARCE_TRAIN=1000 RUN_TAG=proj_fpw075 \
  PHASES=cotrain \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
  GAN_JSON="$PROJ_GAN" TRAIN_JSON='{"fake_pair_weight": 0.75}' \
  run_watch /tmp/r5_scarce1000_fpw075.log 4800 \
  python scripts/run_config3_ref_horizon.py
}

mark queue6_done
