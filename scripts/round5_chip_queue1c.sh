#!/bin/bash
# Round-5 chip queue 1c — second takeover. The queue1b stage-I child
# WEDGED MID-RUN at cycle ~19000 (new failure mode: 30+ min silent at a
# 68 s/500-cycle cadence, one thread parked in wait_woken on the tunnel
# socket, zero CPU — the round-4 serial-dial wedge was at process START;
# this one hit mid-training). Killed by exact PID; stage-I resumes from
# its in-run cycle-10000 checkpoint (resume is bit-exact).
#
# Hardening over 1b:
#  * run_watch: every chip job is monitored by log-file mtime; >STALL s
#    without output (well past the 500-cycle log cadence, slow evals, and
#    the 50-300 s first-compile window) ⇒ kill the orchestrator's children
#    by exact PID (pgrep -P, never by pattern), kill the orchestrator,
#    settle, retry (checkpoint resume). Max 3 tries per item.
#  * DEADLINE: no new item starts after it — the driver's end-of-round
#    bench.py must find a quiet tunnel.
# Order (VERDICT r4 #1 first): resume stage1 -> fpw05 ckpt copy -> bench
# fused-rescan A/B (#5/#6) -> scarce2000 enc arms + fpw05 (#1) ->
# scarce1000 (#1 bracket) -> config2_cal scarce1000 (#7) -> scarce4000 ->
# fullsplit stage1 convergence (#4; partial credit already banked from the
# 19k-cycle health table).
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

# run_watch <log> <timeout_s> <cmd...>
# Retries (resume-from-checkpoint) on watchdog stall kills and timeouts.
run_watch() {
  local log=$1 tmo=$2; shift 2
  local try rc pid now m start c
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
        for c in $(pgrep -P "$pid"); do
          for g in $(pgrep -P "$c"); do kill -9 "$g" 2>/dev/null; done
          kill -9 "$c" 2>/dev/null
        done
        kill -9 "$pid" 2>/dev/null
        wait "$pid" 2>/dev/null
        rc=99; break
      fi
      sleep 30
    done
    echo "rc=$rc try=$try $log" >> "$Q"
    [ "$rc" = "0" ] && return 0
    # 99 = watchdog kill, 124 = timeout: both leave a resumable checkpoint.
    if [ "$rc" != "99" ] && [ "$rc" != "124" ]; then return "$rc"; fi
    sleep 75   # settle the tunnel before re-dial (CLAUDE.md wedge note)
  done
  return 1
}

PROJ_GAN='{"gp_lambda": 100.0, "dim": 64, "g_width_mults": [8, 8, 4, 2, 1], "d_width_mults": [1, 2, 4, 8, 8], "acgan_fake_scale": 1.0, "d_projection": true, "acgan_scale_g": 3.0}'
PROJ_GAN_32='{"acgan_fake_scale": 1.0, "d_projection": true, "acgan_scale_g": 3.0}'
RUNS=/root/repo/runs

mark queue1c_start

deadline_ok scarce2000_stage1_resume && {
mark scarce2000_stage1_resume
sleep 75
CONFIG_PRESET=config3_cal SCARCE_TRAIN=2000 RUN_TAG=proj PHASES=stage1 \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
  GAN_JSON="$PROJ_GAN" \
  run_watch /tmp/r5_scarce2000_stage1.log 7200 \
  python scripts/run_config3_ref_horizon.py
}

# Copy the finished stage-I checkpoint for the fake_pair_weight sub-arm
# BEFORE any encoder phase extends the cotrain dir.
mark fpw05_ckpt_copy
SRC=$RUNS/config3_ref_horizon_cal_scarce2000_proj/cotrain
DST=$RUNS/config3_ref_horizon_cal_scarce2000_proj_fpw05/cotrain
mkdir -p "$DST"
cp -r "$SRC/checkpoints" "$DST/" 2>>"$Q" && \
  cp "$SRC/data_provenance.json" "$DST/" 2>>"$Q"
echo "copy rc=$?" >> "$Q"

deadline_ok bench_fused_ab && {
mark bench_fused_ab
sleep 75
run_watch /tmp/r5_bench_fused.json 3600 python bench.py
}

deadline_ok scarce2000_enc_arms && {
mark scarce2000_proj_enc_arms
sleep 75
CONFIG_PRESET=config3_cal SCARCE_TRAIN=2000 RUN_TAG=proj \
  PHASES=cotrain,realonly \
  GAN_CYCLES=24000 ENC_ITERS=20000 SEGMENT_GAN=24000 SEGMENT_ENC=20000 \
  GAN_JSON="$PROJ_GAN" \
  run_watch /tmp/r5_scarce2000_enc.log 7200 \
  python scripts/run_config3_ref_horizon.py
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

mark queue1c_done
