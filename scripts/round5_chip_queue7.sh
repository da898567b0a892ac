#!/bin/bash
# Round-5 chip queue 7 — backfill: if queue5's room gate skipped the
# scarce4000 fpw05 cotrain (its HARD_END was the previous session's
# deadline), run it here after queue6 drains. Completes the
# fake_pair_weight=0.5 curve at all three scarcity points {1000, 2000,
# 4000}. No-op if queue5 already produced the summary.
#
# Usage: HARD_END=<epoch> bash round5_chip_queue7.sh
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

seed_fpw() {
  local src=$RUNS/$1/cotrain dst=$RUNS/$2/cotrain
  [ -d "$src/checkpoints/24000" ] || { mark "seed_fpw: no $1 stage-I ckpt"; return 1; }
  mkdir -p "$dst/checkpoints"
  cp -r "$src/checkpoints/24000" "$dst/checkpoints/" && \
    cp "$src/data_provenance.json" "$dst/" 2>>"$Q"
}

# ---- wait for queue6 to drain (it owns the tunnel until then)
QPID=$(cat /tmp/queue6.pid 2>/dev/null || echo "")
if [ -n "$QPID" ]; then
  while kill -0 "$QPID" 2>/dev/null; do sleep 20; done
fi
mark queue7_start
sleep 75

if [ -f "$RUNS/config3_ref_horizon_cal_scarce4000_proj_fpw05/summary.json" ]; then
  mark "queue7: scarce4000 fpw05 already done by queue5, nothing to do"
else
  room_ok scarce4000_fpw05_backfill 2400 && \
    seed_fpw config3_ref_horizon_cal_scarce4000_proj \
             config3_ref_horizon_cal_scarce4000_proj_fpw05 && {
  mark scarce4000_fpw05_cotrain_q7
  CONFIG_PRESET=config3_cal SCARCE_TRAIN=4000 RUN_TAG=proj_fpw05 \
    PHASES=cotrain \
    GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
    GAN_JSON="$PROJ_GAN" TRAIN_JSON='{"fake_pair_weight": 0.5}' \
    run_watch /tmp/r5_scarce4000_fpw05_q7.log 3600 \
    python scripts/run_config3_ref_horizon.py
  }
fi

mark queue7_done
