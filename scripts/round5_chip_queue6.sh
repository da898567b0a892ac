#!/bin/bash
# Round-5 chip queue 6 — measure the class_balance_mode="mass" fix in the
# regime that exposed the bug (docs/BENCHMARKS.md "one-hot fpw05 sub-arm
# COLLAPSED"): config2_cal scarce1000, fake_pair_weight=0.5, SAME stage-I
# checkpoint and data order as the collapsed count-mode arm — the only
# change is HASH_JSON={"class_balance_mode": "mass"}. Prediction from the
# diagnosis: the 0.350 collapse recovers to >= plain-cotrain 0.577; where
# it lands vs real-only 0.599 is the actual new information.
#
# Second item (room-gated): the same A/B on the multi-label side
# (config3_cal scarce1000 fpw05, count 0.8038) — the docs claim the
# count-mode interaction is marginal there because pair-positive rates are
# ~35% not ~1%; this measures that claim instead of leaving it as prose.
#
# Usage: HARD_END=<epoch> bash round5_chip_queue6.sh
#   Waits for queue5 (/tmp/queue5.pid), settles 75 s, then runs.
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

# ~9 min measured for the count-mode twin (535 s + compile); budget 2400 s
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

# ~33 min measured for the count-mode twin (1986 s); budget 3600 s
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

# Third point on the scarce1000 discount curve {1.0: 0.7729, 0.5: 0.8038}
# (docs call the curve "two points; intermediate values untested"); count
# mode on purpose — it matches the two existing points.
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
