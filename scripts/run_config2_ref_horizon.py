"""Config-2 (CIFAR-10 48-bit PC-WGAN) run at the REFERENCE horizon shape.

The reference's headline workflow (SURVEY.md §3.1/§3.2, expected ref
main.py: step-1 yaml then step-2 yaml from the step-1 checkpoint) is
stage-I PC-WGAN followed by stage-II AlexNet hash training on real+fake
batches, at the CIFAR protocol geometry: 5000 train / 1000 query / 54000
database, 48 bits, MAP@R=5000.  Round 2 demonstrated the paper's
scarce-supervision claim at a small horizon (+9.5 MAP pts at 512 labels);
this script runs the full two-stage workflow at the reference geometry so
the GAN-co-training configuration is demonstrated at protocol scale:

  stage I : GAN_CYCLES PC-WGAN cycles (5 critic + 1 gen each), linear lr
            decay over the budget; Wasserstein plateau is the health gate
            (healthy ~|2-3|, see docs/BENCHMARKS.md).
  stage II: ENC_ITERS encoder steps co-training on real u fake at the
            227px AlexNet protocol, MAP@5000 milestones every 5k steps.
  ablation: same stage II with use_gan_samples=False in a sibling workdir
            (the paper's claim is the DELTA between these two arms).

Usage (real chip; stage I ~1h + each stage-II arm ~1h at measured rates):
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/run_config2_ref_horizon.py
Env overrides: GAN_CYCLES, ENC_ITERS, SKIP_ABLATION=1.
Artifacts land in runs/config2_ref_horizon/{cotrain,real_only}/.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

GAN_CYCLES = int(os.environ.get("GAN_CYCLES", 40_000))
ENC_ITERS = int(os.environ.get("ENC_ITERS", 100_000))
SKIP_ABLATION = os.environ.get("SKIP_ABLATION", "") == "1"
# SMOKE=1: tiny shapes for a tunnel-free CPU rehearsal of the full flow.
SMOKE = os.environ.get("SMOKE", "") == "1"
ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "runs",
                 "config2_ref_horizon" + ("_smoke" if SMOKE else ""))
)


def base_config():
    from hashgan_tpu.configs import get_config

    cfg = get_config("config2")
    cfg = dataclasses.replace(
        cfg,
        # Reference CIFAR protocol splits are already the DataConfig
        # defaults (5000/1000/54000); make the AlexNet 227 input protocol
        # explicit (SURVEY.md C9: resize 256 -> crop 227).
        encoder=dataclasses.replace(
            cfg.encoder, iters=ENC_ITERS, decay_lr=True,
            input_resize=227, resize_base=256,
        ),
        gan=dataclasses.replace(cfg.gan, iters=GAN_CYCLES, ema_decay=0.999),
        train=dataclasses.replace(
            cfg.train, batch_size=64, epoch_shuffle=True,
            eval_every=5000, checkpoint_every=10_000, log_every=500,
            sample_every=5000,
        ),
    )
    if SMOKE:
        cfg = dataclasses.replace(
            cfg,
            data=dataclasses.replace(
                cfg.data, n_train=128, n_query=32, n_database=256),
            gan=dataclasses.replace(cfg.gan, dim=16, z_dim=16),
            encoder=dataclasses.replace(
                cfg.encoder, iters=ENC_ITERS, input_resize=64,
                resize_base=72),
            eval=dataclasses.replace(cfg.eval, R=50),
            train=dataclasses.replace(
                cfg.train, batch_size=16, eval_every=4, log_every=2,
                checkpoint_every=8, sample_every=8),
        )
    return cfg


def main() -> None:
    from hashgan_tpu.train.loop import Experiment

    t0 = time.time()
    out = {"run": "config2_ref_horizon", "gan_cycles": GAN_CYCLES,
           "enc_iters": ENC_ITERS}

    # ---- stage I + stage II, co-training arm --------------------------
    cfg = base_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, workdir=os.path.join(ROOT, "cotrain")),
    )
    exp = Experiment(cfg)
    print(f"[{time.time()-t0:.0f}s] stage I: {GAN_CYCLES} PC-WGAN cycles",
          flush=True)
    gan_means = exp.train_gan(GAN_CYCLES)
    exp.save_checkpoint()
    out["stage1_wall_s"] = time.time() - t0
    out.update({f"gan_{k}": float(v) for k, v in gan_means.items()})
    print(f"[{time.time()-t0:.0f}s] stage I done: "
          f"{json.dumps({k: round(float(v), 4) for k, v in gan_means.items()})}",
          flush=True)

    print(f"[{time.time()-t0:.0f}s] stage II (co-train): {ENC_ITERS} steps",
          flush=True)
    exp.train_encoder(ENC_ITERS)
    final = exp.evaluate()
    exp.save_checkpoint()
    out.update({f"cotrain_{k}": float(v) for k, v in final.items()})
    print(f"[{time.time()-t0:.0f}s] co-train arm done: "
          f"{json.dumps({k: round(float(v), 4) for k, v in final.items()})}",
          flush=True)

    # ---- stage II, real-only ablation arm -----------------------------
    if not SKIP_ABLATION:
        cfg2 = base_config()
        cfg2 = dataclasses.replace(
            cfg2,
            use_gan=False,
            train=dataclasses.replace(
                cfg2.train, workdir=os.path.join(ROOT, "real_only"),
                sample_every=1 << 30),
        )
        exp2 = Experiment(cfg2)
        print(f"[{time.time()-t0:.0f}s] stage II (real-only ablation): "
              f"{ENC_ITERS} steps", flush=True)
        exp2.train_encoder(ENC_ITERS)
        final2 = exp2.evaluate()
        exp2.save_checkpoint()
        out.update({f"real_only_{k}": float(v) for k, v in final2.items()})

    out["wall_s"] = time.time() - t0
    print(json.dumps(out), flush=True)
    with open(os.path.join(ROOT, "summary.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    sys.exit(main())
