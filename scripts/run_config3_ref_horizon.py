"""Config-3 (NUS-WIDE 64-bit multi-label PC-WGAN) at protocol scale.

BASELINE config 3 (SURVEY.md §3.1): multi-label data, 64px, 64-bit codes,
label-conditioned pair sampling, GAN-augmented stage II, MAP@R=5000 at
the NUS-WIDE geometry (10,500 train / 2,100 query / 100,000 database).
This was the last GAN config without a horizon-scale demonstration: its
blocker was that ``pair_sampling=balanced`` forced the 0.28 s/step host
feed on this throttled single-vCPU host. Round-3's device-resident
balanced sampler (data/device_data.py::DeviceBatchSource pair_balanced —
padded per-class pools in HBM, in-jit partner selection) removes it, so
config 3 now trains at fused-window device speed like configs 1/2/4.

Arms mirror run_config2_ref_horizon.py (the paper's claim is the
cotrain-vs-realonly DELTA):
  stage1   : GAN_CYCLES PC-WGAN cycles on multi-hot conditioning.
             Round-2 finding (docs/BENCHMARKS.md scarce multi-label rows):
             64px multi-label stage-I is the hard direction — W plateaus
             high at small image budgets; at 10.5k train images this run
             measures whether protocol-scale data fixes it. The stage-II
             guard warns (not overrides) if |W| > 10.
  cotrain  : ENC_ITERS encoder steps on real u fake.
  realonly : same stage II with use_gan=False.

ENCODER BACKBONE (ENCODER_ARCH, default "resnet"): the reference protocol
is bvlc-pretrained AlexNet (unavailable offline; loader wired + tested).
resnet is the 64px-native backbone proven at config 4; from-scratch runs
pin hash_lr_multiplier=1.0 (the 10x multiplier is the pretrained
protocol — measured saturation collapses in rounds 2 and 3, see
run_config2_ref_horizon.py).

Defaults are sized to fit alongside the round's other chip work
(GAN_CYCLES=30000 ~ 64px cycles are ~4x the 32px cost; ENC_ITERS=50000 —
config-2's curve converged by 10k): override via env for a longer run.

Usage (real chip):
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/run_config3_ref_horizon.py
Env: GAN_CYCLES, ENC_ITERS, SKIP_ABLATION=1, SEGMENT_GAN, SEGMENT_ENC,
ENCODER_ARCH, SCARCE_TRAIN=<n labeled images> (the paper's scarce-
supervision setting; at the full split the synthetic task saturates both
arms), SMOKE=1 (tiny tunnel-free CPU rehearsal).
Artifacts: runs/config3_ref_horizon/{cotrain,real_only}/ + summary.json.
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
import time

GAN_CYCLES = int(os.environ.get("GAN_CYCLES", 30_000))
ENC_ITERS = int(os.environ.get("ENC_ITERS", 50_000))
ENCODER_ARCH = os.environ.get("ENCODER_ARCH", "resnet")
_ARCH_ENC_OVERRIDES = {
    "alexnet": {"input_resize": 227, "resize_base": 256,
                "hash_lr_multiplier": 1.0},
    "resnet": {"hash_lr_multiplier": 1.0},
    "small_cnn": {},
}
SKIP_ABLATION = os.environ.get("SKIP_ABLATION", "") == "1"
SEGMENT_GAN = int(os.environ.get("SEGMENT_GAN", 15_000))
SEGMENT_ENC = int(os.environ.get("SEGMENT_ENC", 50_000))
SMOKE = os.environ.get("SMOKE", "") == "1"
# SCARCE_TRAIN=<n>: shrink the labeled train split (GAN + encoder both see
# only n labeled images; query/database stay at protocol size). The paper's
# GAN-augmentation claim targets SCARCE supervision — at the full 10.5k
# train split the 21-concept synthetic task saturates MAP for both arms
# (measured: cotrain 0.99999 by step 5k), so the delta only has room to
# exist when labels are scarce. 0 = full protocol split.
SCARCE_TRAIN = int(os.environ.get("SCARCE_TRAIN", 0))
# GAN_JSON='{"gp_lambda": 50.0, "d_layernorm": true, ...}': stage-I knob
# overrides (round-4 convergence sweep winners —
# runs/config3_stage1_sweep/summary.json); lists become tuples so
# width-mult overrides land as the dataclass expects.
GAN_JSON = os.environ.get("GAN_JSON", "")
# CONFIG_PRESET=config3_cal: run the arms on the CALIBRATED task (100
# concepts — configs/config.py round 4). Measured this round: the default
# 21-concept task saturates BOTH arms (MAP@5000 = 1.0) even at
# SCARCE_TRAIN=2000, so the paper's delta needs either deeper scarcity or
# the calibrated task. Default preserves the historical runs. Round 5:
# any GAN preset works (config2_cal runs the 32px one-hot calibrated
# direction through the same arm structure).
CONFIG_PRESET = os.environ.get("CONFIG_PRESET", "config3")
# TRAIN_JSON='{"fake_pair_weight": 0.3, ...}': TrainConfig overrides for
# the arms (e.g. the stage-II fake-pair discount — round-4 knob pricing in
# imperfect G conditioning).
TRAIN_JSON = os.environ.get("TRAIN_JSON", "")
# HASH_JSON='{"class_balance_mode": "mass", ...}': HashLossConfig overrides
# (round 5: the fake-pair discount under count-mode class balance collapsed
# the one-hot arm — mass mode makes the discount orthogonal to rebalancing).
HASH_JSON = os.environ.get("HASH_JSON", "")
# RUN_TAG=<tag>: separate artifact root for re-runs of the same arm set at a
# different budget (e.g. ENC_ITERS=50000 RUN_TAG=e50k). Needed because the
# encoder's linear lr decay is tied to ENC_ITERS — resuming a 20k-budget
# checkpoint under a 50k schedule would jump the lr mid-run. Stage-I can be
# reused across budgets by copying the stage-1 checkpoint dir into the new
# ROOT/cotrain/checkpoints (the GAN schedule is untouched by ENC_ITERS).
RUN_TAG = os.environ.get("RUN_TAG", "")
# config3 keeps the historical root name; config3_cal keeps its round-4
# "_cal" suffix; any other preset (e.g. config2_cal) is spelled out.
_PRESET_SUFFIX = ("" if CONFIG_PRESET == "config3"
                  else "_cal" if CONFIG_PRESET == "config3_cal"
                  else f"_{CONFIG_PRESET}")
ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "runs",
                 "config3_ref_horizon"
                 + _PRESET_SUFFIX
                 + (f"_scarce{SCARCE_TRAIN}" if SCARCE_TRAIN else "")
                 + (f"_{RUN_TAG}" if RUN_TAG else "")
                 + ("_smoke" if SMOKE else ""))
)
# PHASES=stage1 / PHASES=cotrain,realonly: run a subset of the arms (e.g.
# stage1 alone so its completed checkpoint can be copied into a sibling
# RUN_TAG root before the encoder phases touch it — stage-II variants like
# the fake_pair_weight arm then reuse one stage-I training run).
# PHASE_SETTLE_S: pause between child spawns. A client that dials the
# tunnel within ~seconds of the previous client's exit can wedge forever
# on its first RPC (CLAUDE.md). Round 4 measured the orchestrator's own
# segment children as safe; round 5 measured a counterexample — the
# config2_cal realonly child wedged at dial seconds after the cotrain
# child exited (12 s CPU over 18 min, parked right after the axon
# platform warning) — so every re-spawn now settles. 0 under SMOKE (the
# CPU rehearsal never dials the tunnel).
PHASE_SETTLE_S = float(
    os.environ.get("PHASE_SETTLE_S", "0" if SMOKE else "45"))
_DEFAULT_PHASES = ("stage1", "cotrain") + (
    () if SKIP_ABLATION else ("realonly",))
PHASES = tuple(os.environ.get("PHASES", ",".join(_DEFAULT_PHASES))
               .split(","))
assert all(p in ("stage1", "cotrain", "realonly") for p in PHASES), PHASES


def base_config(arm: str):
    from hashgan_tpu.configs import get_config

    cfg = get_config(CONFIG_PRESET)
    if SCARCE_TRAIN:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, n_train=SCARCE_TRAIN))
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(
            cfg.encoder, iters=ENC_ITERS, decay_lr=True, arch=ENCODER_ARCH,
            **_ARCH_ENC_OVERRIDES[ENCODER_ARCH],
        ),
        gan=dataclasses.replace(
            cfg.gan, iters=GAN_CYCLES, ema_decay=0.999,
            **({k: tuple(v) if isinstance(v, list) else v
                for k, v in json.loads(GAN_JSON).items()}
               if GAN_JSON else {})),
        train=dataclasses.replace(
            cfg.train, batch_size=64,
            eval_every=5000, checkpoint_every=10_000, log_every=500,
            sample_every=5000, device_data=True,
            **(json.loads(TRAIN_JSON) if TRAIN_JSON else {}),
        ),
        hash_loss=dataclasses.replace(
            cfg.hash_loss,
            **(json.loads(HASH_JSON) if HASH_JSON else {}),
        ),
    )
    if SMOKE:
        cfg = dataclasses.replace(
            cfg,
            data=dataclasses.replace(
                # 32 is the GAN's minimum pyramid base (models/gan.py).
                cfg.data, image_size=32, n_train=96, n_query=32,
                n_database=256),
            gan=dataclasses.replace(cfg.gan, dim=16, z_dim=16),
            encoder=dataclasses.replace(cfg.encoder, iters=ENC_ITERS),
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
    """Parent process: no jax import (the children own the tunnel)."""
    t0 = time.time()
    env = dict(os.environ)
    spawned = False
    for phase in PHASES:
        print(f"=== phase {phase} ===", flush=True)
        while True:
            if spawned and PHASE_SETTLE_S:
                time.sleep(PHASE_SETTLE_S)
            spawned = True
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), phase], env=env,
            ).returncode
            if rc == 0:
                break
            if rc != 3:
                print(f"phase {phase} failed with rc={rc}", flush=True)
                return rc
    out = {"run": "config3_ref_horizon", "gan_cycles": GAN_CYCLES,
           "enc_iters": ENC_ITERS, "encoder_arch": ENCODER_ARCH,
           "wall_s": time.time() - t0}
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
