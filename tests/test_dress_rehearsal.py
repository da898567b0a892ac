"""Real-data dress rehearsal (VERDICT r3 #9): the reference's actual
file-based workflow — on-disk JPEG images + data_list txt files, driven
through the CLI with reference-style step-1/step-2 yaml configs — must work
end-to-end: list parse -> JPEG decode -> resize/crop protocol -> stage-1
GAN -> stage-2 co-train -> eval -> build-index -> query. This is the chain
a user with real CIFAR-10/NUS-WIDE drops their lists into (SURVEY.md §3.5,
C15); everything else in the suite feeds arrays.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-loop integration; -m 'not slow' skips


def _write_jpeg_dataset(root, n_per_split):
    """Tiny 3-class JPEG dataset in the reference layout: class-colored
    noise images so codes can beat chance, lists in data_list format."""
    from PIL import Image

    from hashgan_tpu.data.lists import write_list_file

    rng = np.random.default_rng(0)
    base = np.array([[220, 40, 40], [40, 220, 40], [40, 40, 220]], np.float32)
    lists = {}
    for split, n in n_per_split.items():
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        cls = rng.integers(0, 3, size=n)
        paths = []
        for i, c in enumerate(cls):
            img = np.clip(
                base[c] + rng.normal(0, 30, size=(32, 32, 3)), 0, 255
            ).astype(np.uint8)
            p = os.path.join(d, f"{i:04d}.jpg")
            Image.fromarray(img).save(p, quality=92)
            paths.append(p)
        labels = np.eye(3, dtype=np.float32)[cls]
        lp = os.path.join(root, f"{split}.txt")
        write_list_file(lp, paths, labels)
        lists[split] = lp
    return lists


def _write_yamls(root, lists, workdir):
    """Step-1/step-2 yamls mirroring configs/cifar10_step{1,2}.yaml with
    the list files wired in and test-sized capacity."""
    step1 = f"""
preset: cifar10_48bit_gan
data:
  n_classes: 3
  train_list: {lists['train']}
  test_list: {lists['query']}
  database_list: {lists['database']}
gan: {{dim: 16, z_dim: 16, n_critic: 2}}
encoder: {{arch: alexnet, bits: 16, input_resize: 67, resize_base: 72,
          hash_lr_multiplier: 1.0}}
index: {{bits: 16}}
eval: {{R: 20, pr_curve: false}}
train: {{batch_size: 8, workdir: {workdir}, log_every: 1,
        checkpoint_every: 2, sample_every: 100000, eval_every: 100000}}
"""
    step2 = step1  # the reference reuses the config with stage=2 + resume
    p1 = os.path.join(root, "step1.yaml")
    p2 = os.path.join(root, "step2.yaml")
    with open(p1, "w") as f:
        f.write(step1)
    with open(p2, "w") as f:
        f.write(step2)
    return p1, p2


def test_file_workflow_end_to_end(tmp_path, capsys):
    from hashgan_tpu import cli

    root = str(tmp_path)
    lists = _write_jpeg_dataset(
        root, {"train": 24, "query": 8, "database": 32})
    workdir = os.path.join(root, "run")
    p1, p2 = _write_yamls(root, lists, workdir)

    # Stage 1: two PC-WGAN cycles from JPEG files (checkpoints at step 2).
    cli.main(["train", "--config", p1, "--stage", "1", "--iters", "2"])
    # Stage 2: must auto-restore the stage-1 checkpoint and co-train on
    # real + generated images — the "GAN never trained" fallback firing
    # here would mean the two-step file workflow silently lost the GAN.
    import warnings

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        cli.main(["train", "--config", p2, "--stage", "2", "--iters", "2"])
    assert not any("never been trained" in str(w.message) for w in caught)
    out = capsys.readouterr().out.strip().splitlines()
    metrics = json.loads(out[-1])
    assert "map_at_20" in metrics and 0.0 <= metrics["map_at_20"] <= 1.0

    # Eval standalone (restores the stage-2 checkpoint if present).
    cli.main(["eval", "--config", p2, "--workdir", workdir])
    ev = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "map_at_20" in ev

    # Index + query (serving path) from the same artifacts.
    gal_path = os.path.join(root, "gallery.npz")
    cli.main(["build-index", "--config", p2, "--workdir", workdir,
              "--out", gal_path])
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["items"] == 32 and built["bits"] == 16
    cli.main(["query", "--gallery", gal_path, "--k", "5"])
    q = [json.loads(line)
         for line in capsys.readouterr().out.strip().splitlines()]
    assert q and all(len(r["neighbors"]) == 5 for r in q)
    # ids must be real gallery items (or the documented >=n sentinel)
    assert all(0 <= i <= 32 for r in q for i in r["neighbors"])


def test_list_dataset_applies_geometry_protocol(tmp_path):
    # The decoded file dataset must run the resize-base -> crop protocol in
    # the encode path: codes from 32px JPEGs through input_resize=67 differ
    # from native-size encoding and have the right shape.
    from hashgan_tpu.configs import get_config
    import dataclasses

    from hashgan_tpu.data import make_splits

    root = str(tmp_path)
    lists = _write_jpeg_dataset(root, {"train": 8, "query": 4, "database": 8})
    cfg = get_config("config2")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, n_classes=3, train_list=lists["train"],
            test_list=lists["query"], database_list=lists["database"]),
    )
    splits = make_splits(cfg.data)
    assert splits["train"].images.shape == (8, 32, 32, 3)
    assert splits["train"].images.dtype == np.uint8
    assert splits["train"].labels.shape == (8, 3)
