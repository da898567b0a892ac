"""Device-resident data feed (data/device_data.py): step purity, epoch
partition semantics, mesh sharding, and resume-exact training integration."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hashgan_tpu.configs import (
    Config, DataConfig, EncoderConfig, GanConfig, TrainConfig,
)
from hashgan_tpu.data.device_data import DeviceBatchSource, make_batch_feed
from hashgan_tpu.data.synthetic import SyntheticImageDataset


def _indexed_dataset(n: int, size: int = 8) -> SyntheticImageDataset:
    """Labels are the identity matrix, so argmax(labels) recovers the
    gathered row index."""
    rng = np.random.default_rng(0)
    return SyntheticImageDataset(
        images=rng.integers(0, 256, size=(n, size, size, 3), dtype=np.uint8),
        labels=np.eye(n, dtype=np.float32),
    )


def test_step_purity_and_iter_consistency():
    ds = _indexed_dataset(40)
    src = DeviceBatchSource(ds, batch_size=8, seed=3)
    a0, l0 = src.batch(5)
    a1, l1 = src.batch(5)
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    # iter(start) must replay batch(start), batch(start+1), ...
    it = src.iter(start_step=7)
    for step in (7, 8, 9):
        imgs, labs = next(it)
        ref_imgs, ref_labs = src.batch(step)
        np.testing.assert_array_equal(np.asarray(imgs), np.asarray(ref_imgs))
        np.testing.assert_array_equal(np.asarray(labs), np.asarray(ref_labs))


def test_epoch_shuffle_partitions_dataset():
    """Within one epoch the batches are disjoint (without replacement) and
    cover bpe * batch_size distinct rows; epochs reshuffle."""
    n, b = 37, 8
    ds = _indexed_dataset(n)
    src = DeviceBatchSource(ds, batch_size=b, seed=1, epoch_shuffle=True)
    bpe = n // b
    seen = []
    for step in range(bpe):
        _, labs = src.batch(step)
        seen.extend(np.argmax(np.asarray(labs), axis=1).tolist())
    assert len(seen) == bpe * b
    assert len(set(seen)) == bpe * b  # no within-epoch repeats
    _, labs2 = src.batch(bpe)  # first batch of epoch 1
    epoch1 = np.argmax(np.asarray(labs2), axis=1).tolist()
    assert epoch1 != seen[:b]  # reshuffled (astronomically unlikely equal)


def test_stacked_gan_batches_shape():
    ds = _indexed_dataset(64, size=4)
    src = DeviceBatchSource(ds, batch_size=4, seed=0, n_batches=3)
    imgs, labs = src.batch(0)
    assert imgs.shape == (3, 4, 4, 4, 3)
    assert labs.shape == (3, 4, 64)


def test_mesh_sharded_feed():
    from hashgan_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    ds = _indexed_dataset(64, size=4)
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data"))
    src = DeviceBatchSource(ds, batch_size=16, seed=0, sharding=sharding,
                            mesh=mesh)
    imgs, _ = src.batch(0)
    assert imgs.sharding.spec == jax.sharding.PartitionSpec("data")


def _tiny_cfg(workdir: str, device_data: bool) -> Config:
    return Config(
        data=DataConfig(n_train=48, n_query=8, n_database=32, n_classes=4,
                        image_size=8),
        gan=GanConfig(dim=8, z_dim=8, n_critic=2, iters=2,
                      compute_dtype="float32"),
        encoder=EncoderConfig(arch="small_cnn", bits=16, iters=6,
                              compute_dtype="float32"),
        train=TrainConfig(batch_size=8, log_every=100, eval_every=10_000,
                          checkpoint_every=10_000, sample_every=10_000,
                          epoch_shuffle=True, device_data=device_data,
                          workdir=workdir),
        use_gan=False,
    )


def test_device_data_training_resume_bit_exact(tmp_path):
    """Kill/restart at step 3 of 6 must reproduce the uninterrupted run's
    params exactly (step-pure device sampling)."""
    from hashgan_tpu.train.loop import Experiment

    cfg_a = _tiny_cfg(str(tmp_path / "a"), device_data=True)
    exp_a = Experiment(cfg_a)
    exp_a.train_encoder(iters=6, eval_during=False)
    p_a = jax.device_get(exp_a.encoder_state.params)

    cfg_b = _tiny_cfg(str(tmp_path / "b"), device_data=True)
    exp_b = Experiment(cfg_b)
    exp_b.train_encoder(iters=3, eval_during=False)
    exp_b.save_checkpoint()
    exp_b2 = Experiment(cfg_b)
    exp_b2.restore_checkpoint()
    assert int(jax.device_get(exp_b2.encoder_state.step)) == 3
    exp_b2.train_encoder(iters=3, eval_during=False)
    p_b = jax.device_get(exp_b2.encoder_state.params)

    jax.tree_util.tree_map(np.testing.assert_array_equal, p_a, p_b)


def _multilabel_dataset(n: int, k: int = 7, size: int = 8,
                        p: float = 0.25) -> SyntheticImageDataset:
    rng = np.random.default_rng(11)
    return SyntheticImageDataset(
        images=rng.integers(0, 256, size=(n, size, size, 3), dtype=np.uint8),
        labels=(rng.random((n, k)) < p).astype(np.float32),
    )


def test_class_pools_roundtrip():
    from hashgan_tpu.data.device_data import _class_pools

    ds = _multilabel_dataset(50)
    pool, sizes = _class_pools(ds.labels)
    act = ds.labels > 0.5
    for c in range(ds.labels.shape[1]):
        members = set(np.nonzero(act[:, c])[0].tolist())
        assert int(sizes[c]) == len(members)
        assert set(pool[c, : sizes[c]].tolist()) == members


def test_make_batch_feed_pair_balanced_on_device(tmp_path):
    """device_data + pair_balanced runs the in-jit sampler (no host
    fallback) and keeps the positive-pair guarantee: each second-half
    partner shares >= 1 active label with its first-half anchor."""
    cfg = _tiny_cfg(str(tmp_path / "c"), device_data=True)
    ds = _multilabel_dataset(64)
    feed = make_batch_feed(ds, cfg, start_step=0, seed=0,
                           pair_balanced=True)
    b = cfg.train.batch_size
    half = b // 2
    # Recover row indices by matching images (uint8 rows are unique whp).
    flat = ds.images.reshape(len(ds), -1)
    for _ in range(4):
        imgs, labs = next(feed)
        imgs = np.asarray(imgs)
        assert imgs.shape[0] == b
        idx = np.array([
            int(np.nonzero((flat == r.reshape(-1)).all(axis=1))[0][0])
            for r in imgs
        ])
        anchors, partners = idx[:half], idx[b - half:]
        for a, p in zip(anchors, partners):
            shared = float(ds.labels[a] @ ds.labels[p])
            if ds.labels[a].sum() > 0:
                assert shared > 0, (a, p)
            else:
                assert p == a  # no-label rows self-partner


def test_pair_balanced_step_pure_and_unique_classes_self_partner():
    # Identity labels: every class pool has exactly one member, so each
    # partner must BE its anchor; and batch(step) is pure in step.
    ds = _indexed_dataset(40)
    src = DeviceBatchSource(ds, batch_size=8, seed=5, pair_balanced=True)
    i0, l0 = src.batch(3)
    i1, l1 = src.batch(3)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    rows = np.argmax(np.asarray(l0), axis=1)
    np.testing.assert_array_equal(rows[8 - 4:], rows[:4])


def test_pair_balanced_rejects_stacked_batches():
    ds = _multilabel_dataset(32)
    with pytest.raises(ValueError, match="n_batches"):
        DeviceBatchSource(ds, batch_size=4, n_batches=3, pair_balanced=True)


def test_pair_balanced_fused_training_resume_bit_exact(tmp_path):
    """config-3's sampler through the FULL fused device_data loop:
    a kill/restart at step 3 of 6 reproduces the uninterrupted params."""
    import dataclasses as _dc

    from hashgan_tpu.train.loop import Experiment

    def cfg(workdir):
        c = _tiny_cfg(workdir, device_data=True)
        return _dc.replace(
            c,
            data=_dc.replace(c.data, multi_label=True),
            train=_dc.replace(c.train, pair_sampling="balanced"),
        )

    exp_a = Experiment(cfg(str(tmp_path / "a")))
    exp_a.train_encoder(iters=6, eval_during=False)
    p_a = jax.device_get(exp_a.encoder_state.params)

    cfg_b = cfg(str(tmp_path / "b"))
    exp_b = Experiment(cfg_b)
    exp_b.train_encoder(iters=3, eval_during=False)
    exp_b.save_checkpoint()
    exp_b2 = Experiment(cfg_b)
    exp_b2.restore_checkpoint()
    exp_b2.train_encoder(iters=3, eval_during=False)
    p_b = jax.device_get(exp_b2.encoder_state.params)

    jax.tree_util.tree_map(np.testing.assert_array_equal, p_a, p_b)


@pytest.mark.slow
def test_device_data_gan_loop_smoke(tmp_path):
    """Two fused GAN cycles through the device-resident feed."""
    from hashgan_tpu.train.loop import Experiment

    base = _tiny_cfg(str(tmp_path / "g"), device_data=True)
    cfg = dataclasses.replace(
        base, use_gan=True,
        data=dataclasses.replace(base.data, image_size=32),  # G/D need >=32px
    )
    exp = Experiment(cfg)
    exp.train_gan(iters=2)
    exp.train_encoder(iters=2, eval_during=False)  # co-train consumes feed too
    assert np.isfinite(float(jax.device_get(
        exp.encoder_state.step)))  # loop completed through the device feed


def test_resident_encoder_matches_host_path(tmp_path):
    """Device-resident eval encode is bit-exact vs the per-batch host path
    (same batch slicing, same padded shapes, single device)."""
    from hashgan_tpu.train.loop import Experiment

    cfg = _tiny_cfg(str(tmp_path / "r"), device_data=True)
    exp = Experiment(cfg)
    exp.train_encoder(iters=2, eval_during=False)
    codes_resident = exp.encode_split("database")

    import dataclasses as dc
    cfg_host = dc.replace(cfg, train=dc.replace(cfg.train, device_data=False))
    exp_host = Experiment.__new__(Experiment)
    exp_host.__dict__.update(exp.__dict__)
    exp_host.cfg = cfg_host
    codes_host = exp_host.encode_split("database")

    np.testing.assert_array_equal(codes_resident, codes_host)
    assert codes_resident.shape == (32, 16)


def test_fused_windows_match_per_step_training(tmp_path):
    """The fused lax.scan window path must produce bit-identical params to
    stepping one-at-a-time through the same device feed (window=1)."""
    from hashgan_tpu.train.loop import Experiment

    def run(workdir, log_every):
        base = _tiny_cfg(workdir, device_data=True)
        cfg = dataclasses.replace(
            base, train=dataclasses.replace(
                base.train, log_every=log_every, eval_every=6 * log_every,
                checkpoint_every=6 * log_every))
        exp = Experiment(cfg)
        exp.train_encoder(iters=6, eval_during=False)
        return jax.device_get(exp.encoder_state.params)

    p_fused = run(str(tmp_path / "f"), log_every=3)   # window=3: 2 dispatches
    p_step = run(str(tmp_path / "s"), log_every=1)    # window=1: 6 dispatches
    jax.tree_util.tree_map(np.testing.assert_array_equal, p_fused, p_step)


@pytest.mark.slow
def test_fused_gan_windows_match_per_cycle(tmp_path):
    """Fused GAN windows == per-cycle execution, bit-exact."""
    from hashgan_tpu.train.loop import Experiment

    def run(workdir, log_every):
        base = _tiny_cfg(workdir, device_data=True)
        cfg = dataclasses.replace(
            base, use_gan=True,
            data=dataclasses.replace(base.data, image_size=32),
            train=dataclasses.replace(
                base.train, log_every=log_every, sample_every=10_000,
                checkpoint_every=10_000))
        exp = Experiment(cfg)
        exp.train_gan(iters=4)
        return jax.device_get(exp.gan_state.g_params)

    p_fused = run(str(tmp_path / "f"), log_every=2)
    p_cycle = run(str(tmp_path / "s"), log_every=1)
    jax.tree_util.tree_map(np.testing.assert_array_equal, p_fused, p_cycle)
