"""Device-side synthetic generation (data/synthetic._make_synthetic_device).

Run-scale split generation is host-bound on the dev machine (single
throttled vCPU, ~28 min of standard_normal for a 100k x 64px split) and VM
re-images keep wiping the bit-exact disk cache — the device generator moves
composition + noise onto the jax backend. These tests pin its contracts:
determinism, template bit-identity with the numpy path, composition
semantics, auto-routing, and cache round-trip.
"""

import dataclasses
import os

import numpy as np
import pytest

from hashgan_tpu.configs import DataConfig
from hashgan_tpu.data import synthetic
from hashgan_tpu.data.synthetic import (
    _use_device_gen,
    make_splits,
    make_synthetic,
)


def test_device_gen_deterministic_single_and_multi():
    for ml in (False, True):
        a, _ = make_synthetic(37, 6, size=16, multi_label=ml, seed=5,
                              device=True)
        b, _ = make_synthetic(37, 6, size=16, multi_label=ml, seed=5,
                              device=True)
        np.testing.assert_array_equal(a.images, b.images)
        np.testing.assert_array_equal(a.labels, b.labels)
        c, _ = make_synthetic(37, 6, size=16, multi_label=ml, seed=6,
                              device=True)
        assert not np.array_equal(a.images, c.images)


def test_device_gen_templates_bit_identical_to_numpy_path():
    # The frozen-template classifier must be path-independent.
    _, t_host = make_synthetic(4, 5, size=16, seed=9, device=False)
    _, t_dev = make_synthetic(4, 5, size=16, seed=9, device=True)
    np.testing.assert_array_equal(t_host, t_dev)


def test_device_gen_tail_block(monkeypatch):
    # n spanning multiple PRNG blocks with a ragged tail: the padded tail
    # rows must not leak into the output and shapes must be exact.
    monkeypatch.setattr(synthetic, "_DEVICE_BLOCK", 8)
    ds, _ = make_synthetic(21, 4, size=8, multi_label=True, seed=2,
                           device=True)
    assert ds.images.shape == (21, 8, 8, 3)
    assert ds.images.dtype == np.uint8
    assert ds.labels.shape == (21, 4)


def test_device_gen_single_label_class_signal():
    ds, templates = make_synthetic(96, 5, size=16, noise_scale=25.0, seed=3,
                                   device=True)
    cls = ds.labels.argmax(axis=1)
    d = np.linalg.norm(
        ds.images.astype(np.float32).reshape(96, 1, -1)
        - templates.reshape(1, 5, -1), axis=-1)
    assert (d.argmin(axis=1) == cls).mean() > 0.9


def test_device_gen_multilabel_composition_noise_free():
    # noise_scale=0 makes the image the exact uint8 cast of the composed
    # template scene: concept 1 fills the canvas, concepts 2/3 overwrite
    # quadrants (0, half) and (half, 0) — same scheme as the numpy path.
    n, size = 64, 8
    ds, templates = make_synthetic(n, 7, size=size, multi_label=True,
                                   noise_scale=0.0, seed=4, device=True)
    tmpl_u8 = np.clip(templates, 0, 255).astype(np.uint8)
    half = size // 2
    counts = ds.labels.sum(axis=1).astype(int)
    assert set(np.unique(counts)) <= {1, 2, 3}
    assert counts.min() >= 1
    hit3 = 0
    for i in range(n):
        active = np.flatnonzero(ds.labels[i])
        # Every active concept's template must appear verbatim somewhere.
        if counts[i] == 1:
            np.testing.assert_array_equal(ds.images[i], tmpl_u8[active[0]])
        elif counts[i] == 3:
            hit3 += 1
            img = ds.images[i]
            quad2 = img[0:half, half:size]
            quad3 = img[half:size, 0:half]
            match2 = [c for c in active
                      if np.array_equal(quad2, tmpl_u8[c][0:half, half:size])]
            match3 = [c for c in active
                      if np.array_equal(quad3, tmpl_u8[c][half:size, 0:half])]
            assert match2 and match3
    assert hit3 > 0


def test_use_device_gen_auto_and_env(monkeypatch):
    small = DataConfig(n_train=64, n_query=16, n_database=128, image_size=16)
    big = dataclasses.replace(small, n_database=300_000, image_size=32)
    monkeypatch.delenv("HASHGAN_SYNTH_DEVICE", raising=False)
    assert not _use_device_gen(small)
    assert _use_device_gen(big)
    monkeypatch.setenv("HASHGAN_SYNTH_DEVICE", "on")
    assert _use_device_gen(small)
    monkeypatch.setenv("HASHGAN_SYNTH_DEVICE", "off")
    assert not _use_device_gen(big)


def test_make_splits_device_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("HASHGAN_SYNTH_DEVICE", "on")
    monkeypatch.setenv("HASHGAN_SYNTH_CACHE", str(tmp_path))
    cfg = DataConfig(n_train=24, n_query=8, n_database=40, image_size=8,
                     n_classes=4, seed=11)
    first = make_splits(cfg)
    cached = [d for d in os.listdir(tmp_path) if d.endswith("_dev1")]
    assert cached, "device-path cache key must carry the _dev1 suffix"
    second = make_splits(cfg)
    for split in ("train", "query", "database"):
        np.testing.assert_array_equal(first[split].images,
                                      second[split].images)
        np.testing.assert_array_equal(first[split].labels,
                                      second[split].labels)


def test_device_gen_golden_digest():
    """Pin the default-block keyed bit stream (ADVICE r3): an accidental
    _DEVICE_BLOCK or fold_in key-scheme change must fail a test, not
    silently re-key every cached split. Digests were produced by this exact
    code on the forced-CPU test backend; jax threefry bits are
    platform-stable (the f32 normal transform is the only ulp risk, and the
    test backend is fixed by conftest)."""
    import hashlib

    golden = {
        False: ("814fc262a61e379dc4661e476490e52089841ee47fbe4f7c9b9503656b1b01f2",
                "1f8e8906ca40a87e683ff03bbd50424c7abdeadb7fc9f8a1a4fba99809d20df4"),
        True: ("d2c2f0a39ae1c41348f2d9d527b26af54a3efee66a78b4ca3ada9ba6c6f7a3f1",
               "6fc023276fb3508174e28185f042d23b7cb006554ddd8ef610f3155cae845d95"),
    }
    for ml, (img_d, lab_d) in golden.items():
        ds, _ = make_synthetic(40, 5, size=16, multi_label=ml, seed=13,
                               device=True)
        assert hashlib.sha256(ds.images.tobytes()).hexdigest() == img_d
        assert hashlib.sha256(ds.labels.tobytes()).hexdigest() == lab_d


def test_device_gen_multilabel_needs_three_classes():
    with pytest.raises(AssertionError, match="n_classes >= 3"):
        make_synthetic(8, 2, size=8, multi_label=True, seed=1, device=True)


def test_make_splits_warns_device_without_cache(monkeypatch):
    monkeypatch.setenv("HASHGAN_SYNTH_DEVICE", "on")
    monkeypatch.setenv("HASHGAN_SYNTH_CACHE", "off")
    cfg = DataConfig(n_train=8, n_query=4, n_database=8, image_size=8,
                     n_classes=3, seed=3)
    with pytest.warns(UserWarning, match="HASHGAN_SYNTH_CACHE=off"):
        make_splits(cfg)


def test_generation_key_device_suffix():
    from hashgan_tpu.data.synthetic import synth_generation_key

    cfg = DataConfig(n_train=8, n_query=4, n_database=8, image_size=8)
    assert synth_generation_key(cfg, device=True) == (
        synth_generation_key(cfg, device=False) + "_dev1")
