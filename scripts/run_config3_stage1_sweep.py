"""Stage-I convergence sweep for the hard direction: 64px multi-label PC-WGAN.

Three rounds of measurements (docs/BENCHMARKS.md scarce multi-label rows;
docs/artifacts/config3_horizon_summary.json) show config3's stage-I
Wasserstein plateauing at 24-87 vs the ~2-3 of every healthy 32px one-hot
run — far above the repo's own |W|>10 co-training health threshold. This
sweep treats that as a bug (VERDICT r3 "weak" #1): short probes at protocol
data scale (10.5k train images, 64px, 21-concept multi-hot), one knob per
arm, ranked by the late-window Wasserstein trajectory.

Arms (one GanConfig knob each, round-4 additions in configs/config.py):
  base     control = the exact round-3 horizon recipe
  ln       LayerNorm in the critic res-blocks (the reference's critic norm
           under GP, SURVEY.md C7 — never enabled in rounds 1-3)
  gp50     gradient-penalty weight 50 (measured GP ~ 1.06 at plateau means
           the Lipschitz constraint is badly violated at lambda=10)
  fakeaux  aux head trained on fakes too (full-ACGAN D; g_aux_ce ~ 58 >
           chance 14.6 means the real-only head is adversarially confident
           where G lives)
  stagedw  classic 64px WGAN-GP channel geometry: dim 64 with widths
           8-8-4-2-1 (G) / 1-2-4-8-8 (D) instead of constant 128
  condnorm unit-sum normalized multi-hot conditioning
  lr1e-4   halved-then-some learning rate

Usage (real chip, ~8-12 min/arm):
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/run_config3_stage1_sweep.py
Env: PROBE_CYCLES (default 3000), ARMS (comma list to subset), SMOKE=1
(tiny tunnel-free CPU rehearsal). Artifacts: runs/config3_stage1_sweep/
<arm>/metrics.jsonl + sweep summary.json (updated after every arm).
"""

from __future__ import annotations

import dataclasses
import gc
import json
import os
import time

PROBE_CYCLES = int(os.environ.get("PROBE_CYCLES", 3000))
SMOKE = os.environ.get("SMOKE", "") == "1"
# PRESET=config3_cal runs the sweep on the calibrated 100-concept task —
# the one the scarce-supervision measurement actually needs (the measured
# cal stage-I failure is CONDITIONING, not Lipschitz: g_aux_ce pinned at
# ~10 == its init value for 14k cycles while g_adv diverged 9.8 -> 59 and
# conditional_accuracy_tmpl stayed at chance; /tmp/cal_scarce2000.log,
# runs/config3_ref_horizon_cal_scarce2000).
PRESET = os.environ.get("PRESET", "config3")
ROOT = os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..", "runs",
    "config3_stage1_sweep"
    + (f"_{PRESET.removeprefix('config3_')}" if PRESET != "config3" else "")
    + ("_smoke" if SMOKE else "")))

ARMS = {
    "base": {},
    "ln": {"d_layernorm": True},
    "gp50": {"gp_lambda": 50.0},
    "fakeaux": {"acgan_fake_scale": 1.0},
    "stagedw": {"dim": 64, "g_width_mults": (8, 8, 4, 2, 1),
                "d_width_mults": (1, 2, 4, 8, 8)},
    "condnorm": {"cond_label_norm": True},
    "lr1e-4": {"lr": 1e-4},
    # --- phase 2 (combinations; phase-1 measured ranking at 3k cycles:
    # gp50 W=58 << stagedw 98 << base~condnorm~fakeaux 131-133 < lr1e-4 146
    # < ln 152; fakeaux cut g_aux_ce 15->7 without moving W) ---
    "gp100": {"gp_lambda": 100.0},
    "gp50_stagedw": {"gp_lambda": 50.0, "dim": 64,
                     "g_width_mults": (8, 8, 4, 2, 1),
                     "d_width_mults": (1, 2, 4, 8, 8)},
    "gp100_stagedw": {"gp_lambda": 100.0, "dim": 64,
                      "g_width_mults": (8, 8, 4, 2, 1),
                      "d_width_mults": (1, 2, 4, 8, 8)},
    "gp50_fakeaux": {"gp_lambda": 50.0, "acgan_fake_scale": 1.0},
    # phase 3: the triple (phase-2: gp100_stagedw W=41.5 best; fakeaux
    # W-neutral but cuts g_aux_ce ~3x — conditioning matters for stage-II
    # label inheritance)
    "combo": {"gp_lambda": 100.0, "dim": 64,
              "g_width_mults": (8, 8, 4, 2, 1),
              "d_width_mults": (1, 2, 4, 8, 8),
              "acgan_fake_scale": 1.0},
}

_COMBO = ARMS["combo"]
# --- phase 4 (PRESET=config3_cal; attack the CONDITIONING failure).
# The measured cal run shows a Lipschitz-healthy critic (GP 0.08) with a
# generator that (a) loses the adversarial game progressively (g_adv
# 9.8 -> 59 over 14k cycles) and (b) never moves its aux CE off init
# (~10, == chance) under acgan_scale_g=0.1 — so GAN-pair label
# inheritance feeds pure noise into stage-II (measured -7.1 MAP pts).
# Arms probe the two candidate causes: the G aux weight being 100x
# smaller than the adversarial term, and the critic over-powering G at
# n_critic=5.
ARMS.update({
    "c_gaux1": {**_COMBO, "acgan_scale_g": 1.0},
    "c_gaux3": {**_COMBO, "acgan_scale_g": 3.0},
    "c_nc2": {**_COMBO, "n_critic": 2},
    "c_gaux1_nc2": {**_COMBO, "acgan_scale_g": 1.0, "n_critic": 2},
    # diagnostic: same geometry, one-hot labels — isolates multi-hot
    # conditioning from 64px/100-class generation difficulty.
    "c_onehot": {"gan": _COMBO, "data": {"multi_label": False}},
    # bigger critic batches stabilize the W estimate (WGAN-GP folklore);
    # cycles halved so the probe sees the same number of images.
    "c_b128": {"gan": {**_COMBO, "iters": PROBE_CYCLES // 2},
               "train": {"batch_size": 128}},
})

# --- phase 5 (conditioning escalation). Phase-4 measured: acgan_scale_g
# is THE gate — 3.0 moved cond_acc_tmpl chance->0.141 (still climbing at
# probe end) while n_critic=2 starved it and one-hot failed identically.
# Escalate the weight, and probe the projection critic (d_projection) —
# the architectural route that conditions through the adversarial term
# itself instead of a separately-weighted aux CE.
ARMS.update({
    "c_gaux10": {**_COMBO, "acgan_scale_g": 10.0},
    "c_proj": {**_COMBO, "d_projection": True},
    "c_proj_gaux3": {**_COMBO, "d_projection": True, "acgan_scale_g": 3.0},
})


def _split_overrides(overrides: dict) -> dict:
    """Flat dicts are GanConfig overrides (phase 1-3 arms); dicts keyed by
    section name ({"gan": ..., "data": ..., "train": ...}) spread across the
    config tree (phase-4 arms)."""
    if set(overrides) <= {"gan", "data", "train"}:
        return {"gan": {}, "data": {}, "train": {}, **overrides}
    return {"gan": overrides, "data": {}, "train": {}}


def arm_config(name: str, overrides: dict):
    from hashgan_tpu.configs import get_config

    sec = _split_overrides(overrides)
    gan_overrides = dict(sec["gan"])
    # A per-arm "iters" must replace the probe default, not collide with it
    # (dataclasses.replace rejects duplicate kwargs).
    arm_iters = gan_overrides.pop("iters", PROBE_CYCLES)
    cfg = get_config(PRESET)
    # Stage-I touches only the train split: shrink query/database so the
    # probe neither generates nor parks the 100k gallery. Section overrides
    # win over the probe defaults.
    data_kw = {"n_query": 128, "n_database": 1024, **sec["data"]}
    train_kw = {
        "batch_size": 64, "device_data": True,
        "log_every": 100, "sample_every": max(100, PROBE_CYCLES // 2),
        "checkpoint_every": 1 << 30, "eval_every": 1 << 30,
        "workdir": os.path.join(ROOT, name),
        **sec["train"],
    }
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, **data_kw),
        gan=dataclasses.replace(
            cfg.gan, iters=arm_iters, ema_decay=0.0, **gan_overrides),
        train=dataclasses.replace(cfg.train, **train_kw),
    )
    if SMOKE:
        smoke_gan = {"dim": 16, "z_dim": 16, "iters": 8, **gan_overrides}
        if "g_width_mults" in gan_overrides:  # 32px geometries for width arms
            smoke_gan.update(dim=16, g_width_mults=(2, 2, 1, 1),
                             d_width_mults=(1, 1, 2, 2))
        cfg = dataclasses.replace(
            cfg,
            data=dataclasses.replace(
                cfg.data, image_size=32, n_train=96, n_query=16,
                n_database=64),
            gan=dataclasses.replace(cfg.gan, **smoke_gan),
            train=dataclasses.replace(
                cfg.train, batch_size=16, log_every=2, sample_every=4,
                checkpoint_every=1 << 30, eval_every=1 << 30,
                workdir=os.path.join(ROOT, name)),
        )
    return cfg


def tail_metric(workdir: str, key: str, frac: float = 0.25):
    """Mean of `key` over the last `frac` of logged steps (None if absent)."""
    vals = []
    try:
        with open(os.path.join(workdir, "metrics.jsonl")) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if key in rec:
                    vals.append(float(rec[key]))
    except OSError:
        return None
    if not vals:
        return None
    k = max(1, int(len(vals) * frac))
    return sum(vals[-k:]) / k


def main() -> int:
    os.makedirs(ROOT, exist_ok=True)
    only = os.environ.get("ARMS", "")
    arms = {k: v for k, v in ARMS.items()
            if not only or k in only.split(",")}
    summary = {"probe_cycles": PROBE_CYCLES, "arms": {}}
    spath = os.path.join(ROOT, "summary.json")
    for name, overrides in arms.items():
        from hashgan_tpu.train.loop import Experiment

        print(f"=== arm {name}: {overrides} ===", flush=True)
        t0 = time.time()
        exp = Experiment(arm_config(name, overrides))
        means = exp.train_gan()
        wd = exp.workdir
        del exp
        gc.collect()
        rec = {
            "overrides": {k: str(v) for k, v in overrides.items()},
            "wall_s": time.time() - t0,
            "w_tail": tail_metric(wd, "wasserstein"),
            # d_projection arms additionally log a projection-free critic
            # readout (train/gan_step.py `wasserstein_noproj`): their raw
            # `wasserstein` includes <V y, phi(x)> and is NOT comparable to
            # non-projection arms (VERDICT r4 weak #3).
            "w_noproj_tail": tail_metric(wd, "wasserstein_noproj"),
            "gp_tail": tail_metric(wd, "grad_penalty"),
            "g_aux_tail": tail_metric(wd, "g_aux_ce"),
            "d_aux_tail": tail_metric(wd, "d_aux_ce"),
            "cond_acc_tmpl": tail_metric(wd, "conditional_accuracy_tmpl", 1.0),
            **{f"final_{k}": float(v) for k, v in means.items()},
        }
        summary["arms"][name] = rec
        with open(spath, "w") as f:
            json.dump(summary, f, indent=2)
        print(f"[{name}] W_tail={rec['w_tail']} gp={rec['gp_tail']} "
              f"g_aux={rec['g_aux_tail']} wall={rec['wall_s']:.0f}s",
              flush=True)
    def _comparable_w(v):
        # Projection arms rank by the projection-free readout so the
        # cross-arm W ordering compares one functional.
        return v["w_tail"] if v.get("w_noproj_tail") is None \
            else v["w_noproj_tail"]

    ranked = sorted(
        ((abs(_comparable_w(v)), k) for k, v in summary["arms"].items()
         if _comparable_w(v) is not None))
    summary["ranking_by_abs_w"] = [[k, w] for w, k in ranked]
    # Phase-4 arms attack conditioning, not W: rank by the template
    # classifier's conditional accuracy on samples too (higher = better;
    # this is the quantity whose failure poisons stage-II label
    # inheritance).
    ranked_ca = sorted(
        ((-v["cond_acc_tmpl"], k) for k, v in summary["arms"].items()
         if v.get("cond_acc_tmpl") is not None))
    summary["ranking_by_cond_acc"] = [[k, -nca] for nca, k in ranked_ca]
    with open(spath, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary["ranking_by_abs_w"]), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
