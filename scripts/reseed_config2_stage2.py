"""One-time migration: carry config2's finished stage-I GAN (40k PC-WGAN
cycles, healthy W~1.6) from the archived alexnet-from-scratch run into a
fresh workdir whose checkpoint template uses the ENCODER_ARCH backbone
(see run_config2_ref_horizon.py's docstring for why the backbone changed).

The experiment checkpoint is one orbax item {"encoder", "gan"}, and
StandardRestore requires the template tree to match — so an encoder-arch
swap cannot restore directly.  This script restores with the OLD template
(alexnet, 227 protocol, 1x hash lr), extracts the GAN subtree, and saves
it with a FRESH stage-II encoder at step gan=40000/enc=0 into the new
ROOT, which the segmented runner then resumes normally.

Run tunnel-free (the reseed is pure checkpoint IO — never touch axon):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
    python scripts/reseed_config2_stage2.py
"""

from __future__ import annotations

import dataclasses
import os
import shutil
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

OLD_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "runs",
                 "config2_ref_horizon_alexnet_fromscratch")
)


def main() -> None:
    import jax

    from hashgan_tpu.train.loop import Experiment
    from scripts.run_config2_ref_horizon import ROOT, base_config

    new_cfg = base_config("cotrain")
    assert new_cfg.encoder.arch != "alexnet", (
        "reseed targets a non-alexnet backbone; set ENCODER_ARCH"
    )
    # The archived run's exact config (template must match its checkpoint).
    old_cfg = dataclasses.replace(
        new_cfg,
        encoder=dataclasses.replace(
            new_cfg.encoder, arch="alexnet", input_resize=227,
            resize_base=256, hash_lr_multiplier=1.0,
        ),
    )
    old_exp = Experiment(old_cfg, workdir=os.path.join(OLD_ROOT, "cotrain"))
    if not old_exp.restore_checkpoint():
        raise SystemExit(f"no checkpoint under {OLD_ROOT}/cotrain")
    gan_step = int(jax.device_get(old_exp.gan_state.step))
    print(f"restored archived run: gan step {gan_step}", flush=True)

    new_exp = Experiment(new_cfg)
    new_exp.gan_state = old_exp.gan_state
    new_exp.save_checkpoint()
    print(f"reseeded {new_exp.workdir}: gan={gan_step}, encoder=0 "
          f"({new_cfg.encoder.arch})", flush=True)

    # Stage-1 metrics carry over verbatim (the GAN is the same artifact).
    src = os.path.join(OLD_ROOT, "phase_stage1.json")
    if os.path.exists(src):
        shutil.copy(src, os.path.join(ROOT, "phase_stage1.json"))
        print("copied phase_stage1.json", flush=True)


if __name__ == "__main__":
    main()
