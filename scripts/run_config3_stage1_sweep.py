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
ROOT = os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..", "runs",
    "config3_stage1_sweep" + ("_smoke" if SMOKE else "")))

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


def arm_config(name: str, gan_overrides: dict):
    from hashgan_tpu.configs import get_config

    cfg = get_config("config3")
    cfg = dataclasses.replace(
        cfg,
        # Stage-I touches only the train split: shrink query/database so the
        # probe neither generates nor parks the 100k gallery.
        data=dataclasses.replace(cfg.data, n_query=128, n_database=1024),
        gan=dataclasses.replace(
            cfg.gan, iters=PROBE_CYCLES, ema_decay=0.0, **gan_overrides),
        train=dataclasses.replace(
            cfg.train, batch_size=64, device_data=True,
            log_every=100, sample_every=max(100, PROBE_CYCLES // 2),
            checkpoint_every=1 << 30, eval_every=1 << 30,
            workdir=os.path.join(ROOT, name),
        ),
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
    ranked = sorted(
        ((abs(v["w_tail"]), k) for k, v in summary["arms"].items()
         if v["w_tail"] is not None))
    summary["ranking_by_abs_w"] = [[k, w] for w, k in ranked]
    with open(spath, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary["ranking_by_abs_w"]), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
