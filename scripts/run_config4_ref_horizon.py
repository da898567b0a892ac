"""Config-4 (imagenet100-shaped) run at the REFERENCE training horizon.

Round-2 ran this geometry (13k train / 2k query / 50k gallery, 100 classes,
batch 128, epoch shuffle) to 30k steps and the MAP@1000 curve was still
climbing (0.062@3k -> 0.677@9k -> 0.843@18k -> 0.887@30k). The reference
trains ~100k iterations (SURVEY.md C13, expected ref main.py); this script
extends the same run shape to that horizon with linear lr decay across the
full budget (EncoderConfig.decay_lr) and logs MAP milestones every 5k steps
so the plateau (60k vs 100k within noise) is demonstrated, not extrapolated.

SEGMENTED EXECUTION: the axon tunnel client leaks host memory per dispatch
(~1.15x wire bytes; the first attempt at this run was OOM-killed at step
74k with 130 GB anon RSS — docs/BENCHMARKS.md round 3). Checkpoint resume
is bit-exact incl. data order, so the orchestrator (no jax import) runs
children of <= SEGMENT_ITERS steps each; a child restores, advances one
segment, checkpoints, and exits rc=3 until the horizon is reached.

Usage (real chip, ~2.5h):
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/run_config4_ref_horizon.py
Artifacts land in runs/config4_ref_horizon/ (metrics.jsonl has the curve);
milestone summary is printed as one JSON line at the end.
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
import time

ITERS = int(os.environ.get("ITERS", 100_000))
SEGMENT_ITERS = int(os.environ.get("SEGMENT_ITERS", 30_000))
# SMOKE=1: tiny shapes + sibling workdir for a tunnel-free CPU rehearsal
# of the segmented restore/advance/checkpoint flow.
SMOKE = os.environ.get("SMOKE", "") == "1"
WORKDIR = os.environ.get(
    "WORKDIR",
    os.path.join(os.path.dirname(__file__), "..", "runs",
                 "config4_ref_horizon" + ("_smoke" if SMOKE else "")),
)


def build_config():
    from hashgan_tpu.configs import get_config

    cfg = get_config("config4")
    cfg = dataclasses.replace(
        cfg,
        use_gan=False,  # the stage-II hash-learning curve is the deliverable
        data=dataclasses.replace(
            cfg.data, n_train=13_000, n_query=2000, n_database=50_000,
        ),
        encoder=dataclasses.replace(
            cfg.encoder, iters=ITERS, decay_lr=True,
        ),
        train=dataclasses.replace(
            cfg.train, batch_size=128, epoch_shuffle=True,
            eval_every=5000, checkpoint_every=10_000, log_every=500,
            sample_every=1 << 30,  # no GAN -> no sample grids
            workdir=os.path.abspath(WORKDIR),
            # Device-resident feed (data/device_data.py): the host pipeline
            # measured 0.28 s/step on this throttled single-vCPU host
            # (per-step numpy gather + 1.57 MB wire transfer) vs 23 ms/step
            # of device compute; in-jit gather removes both AND the
            # per-wire-byte tunnel leak that forced small segments.
            device_data=True,
        ),
    )
    if SMOKE:
        cfg = dataclasses.replace(
            cfg,
            data=dataclasses.replace(
                cfg.data, image_size=16, n_train=64, n_query=32,
                n_database=256),
            eval=dataclasses.replace(cfg.eval, R=50),
            train=dataclasses.replace(
                cfg.train, batch_size=16, eval_every=4, log_every=2,
                checkpoint_every=2),
        )
    return cfg


def run_segment() -> int:
    import jax

    from hashgan_tpu.train.loop import Experiment

    t0 = time.time()
    exp = Experiment(build_config())
    exp.restore_checkpoint()
    step = int(jax.device_get(exp.encoder_state.step))
    run = min(ITERS - step, SEGMENT_ITERS)
    if run > 0:
        print(f"[config4] steps {step} -> {step + run} / {ITERS}", flush=True)
        exp.train_encoder(run)
        exp.save_checkpoint()
    if step + max(run, 0) < ITERS:
        return 3
    final = exp.evaluate()
    out = {
        "run": "config4_ref_horizon",
        "iters": ITERS,
        "segment_wall_s": time.time() - t0,
        **{k: float(v) for k, v in final.items()},
    }
    print(json.dumps(out), flush=True)
    with open(os.path.join(os.path.abspath(WORKDIR), "summary.json"), "w") as f:
        json.dump(out, f, indent=2)
    return 0


def orchestrate() -> int:
    # Settle between segment children (serial-dial wedge — see
    # run_config3_ref_horizon.py PHASE_SETTLE_S).
    settle = float(os.environ.get("PHASE_SETTLE_S", "0" if SMOKE else "45"))
    spawned = False
    while True:
        if spawned and settle:
            time.sleep(settle)
        spawned = True
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "segment"],
        ).returncode
        if rc != 3:
            return rc


if __name__ == "__main__":
    if len(sys.argv) > 1:
        sys.exit(run_segment())
    sys.exit(orchestrate())
