"""Config-4 (imagenet100-shaped) run at the REFERENCE training horizon.

Round-2 ran this geometry (13k train / 2k query / 50k gallery, 100 classes,
batch 128, epoch shuffle) to 30k steps and the MAP@1000 curve was still
climbing (0.062@3k -> 0.677@9k -> 0.843@18k -> 0.887@30k). The reference
trains ~100k iterations (SURVEY.md C13, expected ref main.py); this script
extends the same run shape to that horizon with linear lr decay across the
full budget (EncoderConfig.decay_lr) and logs MAP milestones every 5k steps
so the plateau (60k vs 100k within noise) is demonstrated, not extrapolated.

Usage (real chip, ~4h):
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/run_config4_ref_horizon.py
Artifacts land in runs/config4_ref_horizon/ (metrics.jsonl has the curve);
milestone summary is printed as one JSON line at the end.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

ITERS = 100_000
WORKDIR = os.path.join(os.path.dirname(__file__), "..", "runs",
                       "config4_ref_horizon")


def main() -> None:
    from hashgan_tpu.configs import get_config
    from hashgan_tpu.train.loop import Experiment

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
        ),
    )
    t0 = time.time()
    exp = Experiment(cfg)
    exp.train_encoder(ITERS)
    final = exp.evaluate()
    out = {
        "run": "config4_ref_horizon",
        "iters": ITERS,
        "wall_s": time.time() - t0,
        **{k: float(v) for k, v in final.items()},
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    sys.exit(main())
