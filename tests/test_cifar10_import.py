"""CIFAR-10 archive importer (data/cifar10.py): both distribution formats
round-trip into the BASELINE protocol splits, deterministically."""

import os
import pickle

import numpy as np
import pytest

from hashgan_tpu.configs import DataConfig
from hashgan_tpu.data.cifar10 import load_cifar10_dir, make_cifar10_splits


def _synth_archive(tmp_path, fmt, per_batch=60, seed=0):
    """Write a miniature archive (6 batches x per_batch rows) in the given
    format; returns (dir, images (N,32,32,3), labels (N,))."""
    rng = np.random.default_rng(seed)
    d = tmp_path / ("cifar-10-batches-py" if fmt == "py" else
                    "cifar-10-batches-bin")
    os.makedirs(d)
    all_imgs, all_labs = [], []
    names = ([f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]
             if fmt == "py" else
             [f"data_batch_{i}.bin" for i in range(1, 6)] + ["test_batch.bin"])
    for name in names:
        flat = rng.integers(0, 256, (per_batch, 3072)).astype(np.uint8)
        labs = rng.integers(0, 10, per_batch)
        imgs = flat.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        all_imgs.append(imgs)
        all_labs.append(labs)
        if fmt == "py":
            with open(d / name, "wb") as f:
                pickle.dump({b"data": flat, b"labels": labs.tolist()}, f)
        else:
            rows = np.concatenate(
                [labs[:, None].astype(np.uint8), flat], axis=1
            )
            rows.tofile(d / name)
    return str(d), np.concatenate(all_imgs), np.concatenate(all_labs)


@pytest.mark.parametrize("fmt", ["py", "bin"])
def test_load_round_trips_both_formats(fmt, tmp_path):
    d, imgs, labs = _synth_archive(tmp_path, fmt)
    got_i, got_l = load_cifar10_dir(d)
    np.testing.assert_array_equal(got_i, imgs)
    np.testing.assert_array_equal(got_l, labs)
    # parent-directory detection works too
    got_i2, _ = load_cifar10_dir(str(tmp_path))
    np.testing.assert_array_equal(got_i2, imgs)


def test_protocol_splits_are_disjoint_and_deterministic(tmp_path):
    d, imgs, labs = _synth_archive(tmp_path, "bin", per_batch=100, seed=3)
    cfg = DataConfig(name="cifar10", n_query=20, n_train=50, n_database=0,
                     seed=11)
    splits = make_cifar10_splits(d, cfg)
    assert len(splits["query"]) == 20 and len(splits["train"]) == 50
    assert len(splits["database"]) == 600 - 70
    # per-class counts follow the protocol
    for split, per in (("query", 2), ("train", 5)):
        counts = splits[split].labels.sum(axis=0)
        np.testing.assert_array_equal(counts, np.full(10, per))
    # disjointness via image-byte fingerprints
    def fps(ds):
        return {bytes(x.tobytes()) for x in ds.images}
    q, t, db = fps(splits["query"]), fps(splits["train"]), fps(splits["database"])
    assert not (q & t) and not (q & db) and not (t & db)
    # labels are consistent one-hots of the archive labels
    for split in splits.values():
        assert split.labels.shape[1] == 10
        np.testing.assert_array_equal(split.labels.sum(axis=1), 1.0)
    # deterministic across calls
    splits2 = make_cifar10_splits(d, cfg)
    for s in ("train", "query", "database"):
        np.testing.assert_array_equal(splits[s].images, splits2[s].images)


def test_make_splits_routes_cifar10_dir(tmp_path):
    from hashgan_tpu.data import make_splits

    d, _, _ = _synth_archive(tmp_path, "py", per_batch=100, seed=5)
    cfg = DataConfig(name="cifar10", n_query=20, n_train=50, n_database=100,
                     cifar10_dir=d)
    splits = make_splits(cfg)
    assert len(splits["database"]) == 100  # n_database caps the remainder
    assert splits["train"].images.shape[1:] == (32, 32, 3)


def test_insufficient_class_examples_raise(tmp_path):
    d, _, _ = _synth_archive(tmp_path, "bin", per_batch=10, seed=7)
    cfg = DataConfig(n_query=100, n_train=500)
    with pytest.raises(ValueError, match="examples < query"):
        make_cifar10_splits(d, cfg)
