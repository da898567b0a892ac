#!/bin/bash
# Round-5 chip queue 3 — final session. The host was RE-IMAGED between
# sessions: runs/ (stage-I checkpoints, synth cache) is gone, so the
# deadline-cut queue1d items re-run from scratch here. Order (insurance
# first, then the most valuable curve point):
#   1. config2_cal scarce1000  (VERDICT r4 #7 — one-hot 32px direction;
#      cheap, banks a complete result early)
#   2. config3_cal scarce1000  (VERDICT r4 #1 — brackets the measured
#      scarce2000 delta from the deep-scarcity side)
#   3. config3_cal scarce4000  (deadline-gated — saturation-side bracket)
#
# Hardening (inherited from queue1c/1d, plus a hard end):
#  * run_watch: log-mtime stall watchdog, exact-PID tree kill, checkpoint
#    resume, max 3 tries. Pair with round5_watchdog_sidecar.sh so
#    busy-but-silent setup (split gen + first compile, up to ~20 min on
#    this 1-vCPU host — longer under a concurrent pytest) isn't killed:
#    the sidecar touches the log while the child burns CPU.
#  * DEADLINE gates item STARTS; HARD_END caps every item's timeout so
#    nothing of ours can be alive when the driver's end-of-round bench
#    dials the tunnel.
#
# Usage: DEADLINE=<epoch> HARD_END=<epoch> bash round5_chip_queue3.sh
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
Q=/tmp/chip_queue_r5.log
STALL=${STALL:-1500}
DEADLINE=${DEADLINE:?set DEADLINE epoch}
HARD_END=${HARD_END:?set HARD_END epoch}
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

# run_watch <log> <timeout_s> <cmd...> — stall/timeout => kill tree, retry
# (checkpoint resume). Timeout is clipped so the item dies before HARD_END.
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

mark queue3_start

deadline_ok config2cal_scarce1000 && {
mark config2cal_scarce1000
CONFIG_PRESET=config2_cal SCARCE_TRAIN=1000 RUN_TAG=proj \
  ENCODER_ARCH=small_cnn \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
  GAN_JSON="$PROJ_GAN_32" \
  run_watch /tmp/r5_c2cal_scarce1000.log 7200 \
  python scripts/run_config3_ref_horizon.py
}

deadline_ok scarce1000 && {
mark scarce1000_proj_full
sleep 75
CONFIG_PRESET=config3_cal SCARCE_TRAIN=1000 RUN_TAG=proj \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
  GAN_JSON="$PROJ_GAN" \
  run_watch /tmp/r5_scarce1000.log 12600 \
  python scripts/run_config3_ref_horizon.py
}

deadline_ok scarce4000 && {
mark scarce4000_proj_full
sleep 75
CONFIG_PRESET=config3_cal SCARCE_TRAIN=4000 RUN_TAG=proj \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
  GAN_JSON="$PROJ_GAN" \
  run_watch /tmp/r5_scarce4000.log 12600 \
  python scripts/run_config3_ref_horizon.py
}

mark queue3_done
