"""Config-2 (CIFAR-10 48-bit PC-WGAN) run at the REFERENCE horizon shape.

The reference's headline workflow (SURVEY.md §3.1/§3.2, expected ref
main.py: step-1 yaml then step-2 yaml from the step-1 checkpoint) is
stage-I PC-WGAN followed by stage-II AlexNet hash training on real+fake
batches, at the CIFAR protocol geometry: 5000 train / 1000 query / 54000
database, 48 bits, MAP@R=5000.  Round 2 demonstrated the paper's
scarce-supervision claim at a small horizon (+9.5 MAP pts at 512 labels);
this script runs the full two-stage workflow at the reference geometry so
the GAN-co-training configuration is demonstrated at protocol scale:

  stage1   : GAN_CYCLES PC-WGAN cycles (5 critic + 1 gen each), linear lr
             decay over the budget; Wasserstein plateau is the health gate
             (healthy ~|2-3|, see docs/BENCHMARKS.md).
  cotrain  : ENC_ITERS encoder steps co-training on real u fake,
             MAP milestones every eval_every steps.
  realonly : same stage II with use_gan=False in a sibling workdir
             (the paper's claim is the DELTA between these two arms).

ENCODER BACKBONE (ENCODER_ARCH, default "small_cnn"): the reference's
stage-II protocol is bvlc-ImageNet-PRETRAINED AlexNet at 227px (SURVEY.md
C9; loader wired + tested, weights drop in via encoder.pretrained_npy but
are unavailable offline).  Two measured dead ends shaped the default:

- alexnet from scratch: featureless on 32px synthetics upscaled to 227
  (round 2 at 3k steps; round-3 horizon attempt at 19k steps — pair_nll
  FROZEN at 0.7552, MAP@5000 declining 0.148 -> 0.102 = chance; run
  preserved in runs/config2_ref_horizon_alexnet_fromscratch/).
- resnet at the reference's default 10x hash lr: tanh-saturation collapse
  by step 1000 of cotrain (|code|=1.0000 exact, quantization=0,
  bit_balance_sq=1.0 — all codes identical; the saturation guard fired at
  3500).  embed_norm protected config4's 100-class encoder-only run, not
  this 10-class co-training geometry; from-scratch resnet runs here pin
  hash_lr_multiplier=1.0.

small_cnn at its defaults is the round-2-proven config2-shaped cotrain
regime (MAP@1000 0.9999 with a dim-128 GAN at 32px) and is the offline
surrogate; ENCODER_ARCH=alexnet restores the reference protocol for when
pretrained weights are available.

SEGMENTED EXECUTION (why this script re-execs itself): the axon tunnel
client leaks host memory per dispatch (~1.15x the transferred bytes;
measured round 3 — a 100k-step run grew to 130 GB and was OOM-killed at
step 74k; the same loop on the CPU backend is flat). Checkpoint resume is
bit-exact incl. data order (tests/test_checkpoint.py), so the orchestrator
(no jax import) runs each phase as child processes of <= SEGMENT_* iters:
a child restores, advances one segment, checkpoints, and exits rc=3 if its
phase target is not yet reached; rc=0 ends the phase.

Usage (real chip; stage1 ~1h + each stage-II arm ~1h at measured rates):
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/run_config2_ref_horizon.py
Env overrides: GAN_CYCLES, ENC_ITERS, SKIP_ABLATION=1, SEGMENT_GAN,
SEGMENT_ENC, SMOKE=1 (tiny shapes, tunnel-free CPU rehearsal).
Artifacts land in runs/config2_ref_horizon/{cotrain,real_only}/;
summary.json merges the per-phase results.
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
import time

GAN_CYCLES = int(os.environ.get("GAN_CYCLES", 40_000))
ENC_ITERS = int(os.environ.get("ENC_ITERS", 100_000))
ENCODER_ARCH = os.environ.get("ENCODER_ARCH", "small_cnn")
# Per-arch safe settings (module docstring): the 10x hash-lr multiplier is
# the PRETRAINED protocol; from-scratch alexnet AND resnet both measured
# tanh-saturation/featureless failures without these overrides.
_ARCH_ENC_OVERRIDES = {
    "alexnet": {"input_resize": 227, "resize_base": 256,
                "hash_lr_multiplier": 1.0},
    "resnet": {"hash_lr_multiplier": 1.0},
    "small_cnn": {},
}
SKIP_ABLATION = os.environ.get("SKIP_ABLATION", "") == "1"
# Segment sizes: bound the leaked host memory per child process
# (~1.15x wire bytes: 20k GAN cycles ~ 25 GB, 50k enc steps ~ 12 GB).
SEGMENT_GAN = int(os.environ.get("SEGMENT_GAN", 20_000))
SEGMENT_ENC = int(os.environ.get("SEGMENT_ENC", 50_000))
# SMOKE=1: tiny shapes for a tunnel-free CPU rehearsal of the full flow.
SMOKE = os.environ.get("SMOKE", "") == "1"
ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "runs",
                 "config2_ref_horizon" + ("_smoke" if SMOKE else ""))
)
PHASES = ("stage1", "cotrain") + (() if SKIP_ABLATION else ("realonly",))


def base_config(arm: str):
    from hashgan_tpu.configs import get_config

    cfg = get_config("config2")
    cfg = dataclasses.replace(
        cfg,
        # Reference CIFAR protocol splits are already the DataConfig
        # defaults (5000/1000/54000); make the AlexNet 227 input protocol
        # explicit (SURVEY.md C9: resize 256 -> crop 227).
        encoder=dataclasses.replace(
            cfg.encoder, iters=ENC_ITERS, decay_lr=True, arch=ENCODER_ARCH,
            **_ARCH_ENC_OVERRIDES[ENCODER_ARCH],
        ),
        gan=dataclasses.replace(cfg.gan, iters=GAN_CYCLES, ema_decay=0.999),
        train=dataclasses.replace(
            cfg.train, batch_size=64, epoch_shuffle=True,
            eval_every=5000, checkpoint_every=10_000, log_every=500,
            sample_every=5000,
            # Device-resident feed (data/device_data.py): removes the
            # ~0.25 s/step host gather + wire transfer measured on this
            # throttled host AND the per-wire-byte tunnel leak that sized
            # the segments (see run_config4_ref_horizon.py).
            device_data=True,
        ),
    )
    if SMOKE:
        cfg = dataclasses.replace(
            cfg,
            data=dataclasses.replace(
                cfg.data, n_train=128, n_query=32, n_database=256),
            gan=dataclasses.replace(cfg.gan, dim=16, z_dim=16),
            encoder=dataclasses.replace(
                cfg.encoder, iters=ENC_ITERS,
                **({"input_resize": 64, "resize_base": 72}
                   if ENCODER_ARCH == "alexnet" else {}),
            ),
            eval=dataclasses.replace(cfg.eval, R=50),
            train=dataclasses.replace(
                cfg.train, batch_size=16, eval_every=4, log_every=2,
                checkpoint_every=4, sample_every=8),
        )
    if arm == "realonly":
        cfg = dataclasses.replace(
            cfg,
            use_gan=False,
            train=dataclasses.replace(
                cfg.train, workdir=os.path.join(ROOT, "real_only"),
                sample_every=1 << 30),
        )
    else:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, workdir=os.path.join(ROOT, "cotrain")),
        )
    return cfg


def _write_phase(phase: str, payload: dict) -> None:
    os.makedirs(ROOT, exist_ok=True)
    with open(os.path.join(ROOT, f"phase_{phase}.json"), "w") as f:
        json.dump(payload, f, indent=2)


def run_phase_segment(phase: str) -> int:
    """One child process: restore, advance <= one segment, checkpoint.
    Returns 3 if the phase needs more segments, 0 when it is complete."""
    import jax

    from hashgan_tpu.train.loop import Experiment

    t0 = time.time()
    arm = "realonly" if phase == "realonly" else "cotrain"
    cfg = base_config(arm)
    exp = Experiment(cfg)
    exp.restore_checkpoint()

    if phase == "stage1":
        step = int(jax.device_get(exp.gan_state.step))
        run = min(GAN_CYCLES - step, SEGMENT_GAN)
        if run > 0:
            print(f"[stage1] cycles {step} -> {step + run} / {GAN_CYCLES}",
                  flush=True)
            means = exp.train_gan(run)
            exp.save_checkpoint()
            _write_phase(phase, {
                "gan_cycles_done": step + run, "wall_s": time.time() - t0,
                **{f"gan_{k}": float(v) for k, v in means.items()},
            })
        return 3 if step + max(run, 0) < GAN_CYCLES else 0

    step = int(jax.device_get(exp.encoder_state.step))
    run = min(ENC_ITERS - step, SEGMENT_ENC)
    if run > 0:
        print(f"[{phase}] encoder steps {step} -> {step + run} / {ENC_ITERS}",
              flush=True)
        exp.train_encoder(run)
        exp.save_checkpoint()
    if step + max(run, 0) < ENC_ITERS:
        return 3
    final = exp.evaluate()
    _write_phase(phase, {
        "enc_iters_done": ENC_ITERS, "wall_s": time.time() - t0,
        **{k: float(v) for k, v in final.items()},
    })
    print(f"[{phase}] done: "
          f"{json.dumps({k: round(float(v), 4) for k, v in final.items()})}",
          flush=True)
    return 0


def orchestrate() -> int:
    """Parent process: no jax import (one axon process at a time — the
    children own the tunnel). Runs each phase's segments serially."""
    t0 = time.time()
    env = dict(os.environ)
    # Settle between child spawns: a client dialing the tunnel within
    # ~seconds of the previous client's exit can wedge on its first RPC —
    # measured round 5 on an orchestrator's own phase transition
    # (run_config3_ref_horizon.py PHASE_SETTLE_S has the full note).
    settle = float(os.environ.get("PHASE_SETTLE_S", "0" if SMOKE else "45"))
    spawned = False
    for phase in PHASES:
        print(f"=== phase {phase} ===", flush=True)
        while True:
            if spawned and settle:
                time.sleep(settle)
            spawned = True
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), phase], env=env,
            ).returncode
            if rc == 0:
                break
            if rc != 3:
                print(f"phase {phase} failed with rc={rc}", flush=True)
                return rc
    out = {"run": "config2_ref_horizon", "gan_cycles": GAN_CYCLES,
           "enc_iters": ENC_ITERS, "wall_s": time.time() - t0}
    for phase in PHASES:
        try:
            with open(os.path.join(ROOT, f"phase_{phase}.json")) as f:
                rec = json.load(f)
        except OSError:
            continue
        pre = {"stage1": "", "cotrain": "cotrain_",
               "realonly": "real_only_"}[phase]
        out.update({
            (k if k.startswith("gan_") else pre + k): v
            for k, v in rec.items() if k != "wall_s"
        })
    print(json.dumps(out), flush=True)
    with open(os.path.join(ROOT, "summary.json"), "w") as f:
        json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1:
        sys.exit(run_phase_segment(sys.argv[1]))
    sys.exit(orchestrate())
