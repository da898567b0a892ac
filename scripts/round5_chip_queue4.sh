#!/bin/bash
# Round-5 chip queue 4 — fpw05 sub-arms, replacing queue3's scarce4000.
#
# Rationale: by the time queue3's scarce1000 completes, the remaining
# window (~40 min before HARD_END) cannot fit a COMPLETE scarce4000 run
# (~2.5 h) — it would produce a partial stage-I with no MAP numbers. Two
# fake_pair_weight=0.5 cotrain sub-arms fit instead and carry more
# information:
#   1. config2_cal scarce1000 fpw05 — the discount on the ONE-HOT task.
#      Mechanism test: the round-5 +2.1-MAP discount on config3_cal was
#      attributed to residual multi-label pair-label noise; one-hot
#      conditioning at cond_acc 1.0 predicts a smaller (or no) benefit.
#   2. config3_cal scarce1000 fpw05 — the discount at a second scarcity
#      point (is +2.1 MAP at scarce2000 stable as labels get scarcer?).
# Both reuse the parent run's stage-I via the step-24000 checkpoint copy
# (enc step 0 + gan step 24000; cotrain saves land at 34000/44000 and
# max_to_keep=3 preserves 24000 — verified in runs/ before launch).
#
# Usage: DEADLINE=<epoch> HARD_END=<epoch> bash round5_chip_queue4.sh
#   Waits for queue3 (/tmp/queue3.pid); if queue3 reaches its scarce4000
#   mark, kills the queue shell inside its pre-item sleep-75 gap (no chip
#   process is alive there) and takes over.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
Q=/tmp/chip_queue_r5.log
STALL=${STALL:-1500}
DEADLINE=${DEADLINE:?set DEADLINE epoch}
HARD_END=${HARD_END:?set HARD_END epoch}
RUNS=/root/repo/runs
mark() { echo "=== $1 ===" >> "$Q"; date >> "$Q"; }
deadline_ok() {
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    mark "SKIP $1 (past deadline)"; return 1
  fi
  return 0
}

kill_tree() {
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

# seed_fpw <parent_root> <fpw_root> — copy the stage-I-complete checkpoint
# (key 24000: gan 24000 + enc 0) and the provenance record.
seed_fpw() {
  local src=$RUNS/$1/cotrain dst=$RUNS/$2/cotrain
  [ -d "$src/checkpoints/24000" ] || { mark "seed_fpw: no $1 stage-I ckpt"; return 1; }
  mkdir -p "$dst/checkpoints"
  cp -r "$src/checkpoints/24000" "$dst/checkpoints/" && \
    cp "$src/data_provenance.json" "$dst/" 2>>"$Q"
}

# ---- wait on queue3; intercept its scarce4000 item inside the sleep gap
QPID=$(cat /tmp/queue3.pid 2>/dev/null || echo "")
if [ -n "$QPID" ]; then
  while kill -0 "$QPID" 2>/dev/null; do
    if grep -q "=== scarce4000_proj_full ===" "$Q" 2>/dev/null; then
      mark "queue4: intercepting scarce4000 (cannot complete before HARD_END)"
      kill_tree "$QPID"
      break
    fi
    sleep 20
  done
fi
mark queue4_start
sleep 75

deadline_ok c2cal_fpw05 && \
  seed_fpw config3_ref_horizon_config2_cal_scarce1000_proj \
           config3_ref_horizon_config2_cal_scarce1000_proj_fpw05 && {
mark c2cal_scarce1000_fpw05_cotrain
CONFIG_PRESET=config2_cal SCARCE_TRAIN=1000 RUN_TAG=proj_fpw05 \
  PHASES=cotrain ENCODER_ARCH=small_cnn \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
  GAN_JSON="$PROJ_GAN_32" TRAIN_JSON='{"fake_pair_weight": 0.5}' \
  run_watch /tmp/r5_c2cal_fpw05.log 4800 \
  python scripts/run_config3_ref_horizon.py
}

deadline_ok scarce1000_fpw05 && \
  seed_fpw config3_ref_horizon_cal_scarce1000_proj \
           config3_ref_horizon_cal_scarce1000_proj_fpw05 && {
mark scarce1000_fpw05_cotrain
sleep 75
CONFIG_PRESET=config3_cal SCARCE_TRAIN=1000 RUN_TAG=proj_fpw05 \
  PHASES=cotrain \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
  GAN_JSON="$PROJ_GAN" TRAIN_JSON='{"fake_pair_weight": 0.5}' \
  run_watch /tmp/r5_scarce1000_fpw05.log 4800 \
  python scripts/run_config3_ref_horizon.py
}

mark queue4_done
