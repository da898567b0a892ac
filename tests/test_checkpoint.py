"""Checkpoint/resume contract (SURVEY.md §5): a killed-and-restarted run
must produce bit-identical results to an uninterrupted one — both model
params (orbax restore) and data order (step-seeded batches)."""

import pytest

pytestmark = pytest.mark.slow  # full-loop integration tests; -m 'not slow' skips
import numpy as np

from hashgan_tpu.configs import Config, DataConfig, EncoderConfig, TrainConfig


def _cfg(wd):
    return Config(
        data=DataConfig(n_train=64, n_query=8, n_database=32, n_classes=4),
        encoder=EncoderConfig(arch="small_cnn", bits=16),
        train=TrainConfig(batch_size=8, log_every=1000,
                          checkpoint_every=100000, workdir=wd),
        use_gan=False,
    )


def test_resume_is_bit_exact(tmp_path):
    from hashgan_tpu.train.loop import Experiment

    # Uninterrupted: 10 steps.
    exp_a = Experiment(_cfg(str(tmp_path / "a")))
    exp_a.train_encoder(iters=10, eval_during=False)
    codes_a = exp_a.encode_split("query")

    # Interrupted: 6 steps, checkpoint, fresh process-equivalent, 4 more.
    exp_b = Experiment(_cfg(str(tmp_path / "b")))
    exp_b.train_encoder(iters=6, eval_during=False)
    exp_b.save_checkpoint()
    exp_c = Experiment(_cfg(str(tmp_path / "b")))  # same workdir
    assert exp_c.restore_checkpoint()
    assert int(np.asarray(exp_c.encoder_state.step)) == 6
    exp_c.train_encoder(iters=4, eval_during=False)
    codes_c = exp_c.encode_split("query")

    np.testing.assert_array_equal(codes_a, codes_c)


def test_restore_without_checkpoint_returns_false(tmp_path):
    from hashgan_tpu.train.loop import Experiment

    exp = Experiment(_cfg(str(tmp_path / "x")))
    assert exp.restore_checkpoint() is False


def test_gan_state_resume(tmp_path):
    from hashgan_tpu.configs import GanConfig
    import dataclasses as dc
    import jax

    from hashgan_tpu.train.loop import Experiment

    cfg = dc.replace(
        _cfg(str(tmp_path / "g")),
        gan=GanConfig(dim=8, z_dim=16, n_critic=2, iters=50,
                      compute_dtype="float32"),
        use_gan=True,
    )
    exp = Experiment(cfg)
    exp.train_gan(iters=2)
    exp.save_checkpoint()
    exp2 = Experiment(cfg)
    assert exp2.restore_checkpoint()
    assert int(np.asarray(exp2.gan_state.step)) == 2
    a = jax.device_get(exp.gan_state.d_params)
    b = jax.device_get(exp2.gan_state.d_params)
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # training continues from the restored state
    exp2.train_gan(iters=1)
    assert int(np.asarray(exp2.gan_state.step)) == 3


def test_gallery_artifact_checkpoint(tmp_path):
    from hashgan_tpu.utils.checkpoint import load_gallery, save_gallery

    rng = np.random.default_rng(0)
    packed = rng.integers(0, 2**32, (10, 2), dtype=np.uint32)
    labels = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 10)]
    p = str(tmp_path / "g.npz")
    save_gallery(p, packed, labels, 64)
    p2, l2, b2 = load_gallery(p)
    np.testing.assert_array_equal(p2, packed)
    np.testing.assert_array_equal(l2, labels)
    assert b2 == 64


def test_resume_rejects_changed_data_provenance(tmp_path, monkeypatch):
    """ADVICE r3 (medium): a resume whose config/environment would feed
    bit-different data (e.g. a synth-cache wipe flipping the numpy/device
    generation auto-routing) must fail loudly, not silently train on
    different bits mid-run."""
    from hashgan_tpu.train.loop import Experiment

    monkeypatch.delenv("HASHGAN_SYNTH_DEVICE", raising=False)
    monkeypatch.setenv("HASHGAN_SYNTH_CACHE", "off")
    wd = str(tmp_path / "p")
    exp = Experiment(_cfg(wd))
    exp.train_encoder(iters=2, eval_during=False)
    exp.save_checkpoint()

    # Same data path -> restore fine.
    ok = Experiment(_cfg(wd))
    assert ok.restore_checkpoint()

    # Environment flips generation to the device path -> different bits.
    monkeypatch.setenv("HASHGAN_SYNTH_DEVICE", "on")
    bad = Experiment(_cfg(wd))
    with pytest.raises(RuntimeError, match="provenance mismatch"):
        bad.restore_checkpoint()


def test_resume_adopts_legacy_checkpoint_without_provenance(tmp_path,
                                                            monkeypatch):
    import json
    import os

    from hashgan_tpu.train.loop import Experiment

    monkeypatch.delenv("HASHGAN_SYNTH_DEVICE", raising=False)
    wd = str(tmp_path / "l")
    exp = Experiment(_cfg(wd))
    exp.train_encoder(iters=2, eval_during=False)
    exp.save_checkpoint()
    os.remove(os.path.join(wd, "data_provenance.json"))  # pre-round-4 run

    again = Experiment(_cfg(wd))
    assert again.restore_checkpoint()
    with open(os.path.join(wd, "data_provenance.json")) as f:
        assert f and json.load(f)["provenance"].startswith("synth:")
