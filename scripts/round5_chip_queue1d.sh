#!/bin/bash
# Round-5 chip queue 1d — third takeover. Purpose: move the fused-rescan
# bench RETRY (the Mosaic block-shape fix, commit 9897402) ahead of the
# remaining experiment arms so a further Mosaic objection leaves iteration
# margin before round end; the fused engine is worth ~+13e9 cmp/s on the
# graded headline if the A/B confirms.
#
# Usage: DEADLINE=<epoch> bash round5_chip_queue1d.sh <timeout_pid> <orch_pid> <watch_log>
#   waits on the in-flight enc-arms item inherited from queue1c (killed at
#   the queue level only; its chip child keeps running), WITH a stall
#   watchdog during the wait (the round learned mid-run wedges are real),
#   then: bench retry -> fpw05 cotrain -> scarce1000 -> config2_cal
#   scarce1000 -> scarce4000 -> fullsplit stage1. All deadline-gated.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
Q=/tmp/chip_queue_r5.log
STALL=${STALL:-1200}
DEADLINE=${DEADLINE:?set DEADLINE epoch}
mark() { echo "=== $1 ===" >> "$Q"; date >> "$Q"; }
deadline_ok() {
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    mark "SKIP $1 (past deadline)"; return 1
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

# run_watch <log> <timeout_s> <cmd...> — stall/timeout => kill tree, retry.
run_watch() {
  local log=$1 tmo=$2; shift 2
  local try rc pid now m start
  for try in 1 2 3; do
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
RUNS=/root/repo/runs

ENC_ARMS=(env CONFIG_PRESET=config3_cal SCARCE_TRAIN=2000 RUN_TAG=proj
  PHASES=cotrain,realonly
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000
  GAN_JSON="$PROJ_GAN"
  python scripts/run_config3_ref_horizon.py)

mark queue1d_start

# ---- watched wait on the inherited enc-arms item ----------------------
INH_TMO=${1:-}
INH_ORCH=${2:-}
WATCH_LOG=${3:-/tmp/r5_scarce2000_enc.log}
inherited_wedged=0
if [ -n "$INH_TMO" ]; then
  while kill -0 "$INH_TMO" 2>/dev/null; do
    now=$(date +%s)
    m=$(stat -c %Y "$WATCH_LOG" 2>/dev/null || echo "$now")
    if [ $((now - m)) -gt "$STALL" ]; then
      echo "WATCHDOG stall on inherited item $WATCH_LOG" >> "$Q"; date >> "$Q"
      kill_tree "$INH_ORCH" "$INH_TMO"
      inherited_wedged=1
      break
    fi
    sleep 30
  done
fi
mark inherited_item_exited
if [ "$inherited_wedged" = 1 ]; then
  mark scarce2000_enc_arms_resume
  sleep 75
  run_watch /tmp/r5_scarce2000_enc.log 7200 "${ENC_ARMS[@]}"
fi

deadline_ok bench_fused_retry && {
mark bench_fused_retry
sleep 75
run_watch /tmp/r5_bench_fused2.json 3600 python bench.py
}

deadline_ok scarce2000_fpw05 && {
mark scarce2000_fpw05_cotrain
sleep 75
CONFIG_PRESET=config3_cal SCARCE_TRAIN=2000 RUN_TAG=proj_fpw05 \
  PHASES=cotrain \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
  GAN_JSON="$PROJ_GAN" TRAIN_JSON='{"fake_pair_weight": 0.5}' \
  run_watch /tmp/r5_scarce2000_fpw05.log 4800 \
  python scripts/run_config3_ref_horizon.py
}

deadline_ok scarce1000 && {
mark scarce1000_proj_full
sleep 75
CONFIG_PRESET=config3_cal SCARCE_TRAIN=1000 RUN_TAG=proj \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
  GAN_JSON="$PROJ_GAN" \
  run_watch /tmp/r5_scarce1000.log 10800 \
  python scripts/run_config3_ref_horizon.py
}

deadline_ok config2cal_scarce1000 && {
mark config2cal_scarce1000
sleep 75
CONFIG_PRESET=config2_cal SCARCE_TRAIN=1000 RUN_TAG=proj \
  ENCODER_ARCH=small_cnn \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
  GAN_JSON="$PROJ_GAN_32" \
  run_watch /tmp/r5_c2cal_scarce1000.log 7200 \
  python scripts/run_config3_ref_horizon.py
}

deadline_ok scarce4000 && {
mark scarce4000_proj_full
sleep 75
CONFIG_PRESET=config3_cal SCARCE_TRAIN=4000 RUN_TAG=proj \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
  GAN_JSON="$PROJ_GAN" \
  run_watch /tmp/r5_scarce4000.log 10800 \
  python scripts/run_config3_ref_horizon.py
}

deadline_ok fullsplit_stage1 && {
mark fullsplit_stage1_convergence
sleep 75
CONFIG_PRESET=config3_cal RUN_TAG=projconv PHASES=stage1 \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 \
  GAN_JSON="$PROJ_GAN" \
  run_watch /tmp/r5_fullsplit_stage1.log 7200 \
  python scripts/run_config3_ref_horizon.py
}

mark queue1d_done
