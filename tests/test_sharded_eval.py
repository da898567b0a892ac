"""Mesh-sharded evaluation must equal single-device evaluation bit-for-bit
(exact path) / exactly (histogram path) on the same codes — VERDICT r1 #4."""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # full-loop integration tests; -m 'not slow' skips

from hashgan_tpu.eval import (
    device_distance_histograms,
    device_map_at_r,
    device_precision_at_radius,
    shard_gallery_for_eval,
    sharded_distance_histograms,
    sharded_map_at_r,
    sharded_precision_at_radius,
)
from hashgan_tpu.ops import pack_codes_np
from hashgan_tpu.parallel import make_mesh


def _data(n=1000, q=37, bits=32, k=5, seed=0):
    rng = np.random.default_rng(seed)
    pg = pack_codes_np(rng.standard_normal((n, bits)).astype(np.float32))
    pq = pack_codes_np(rng.standard_normal((q, bits)).astype(np.float32))
    dlab = np.eye(k, dtype=np.float32)[rng.integers(0, k, n)]
    qlab = np.eye(k, dtype=np.float32)[rng.integers(0, k, q)]
    return pq, pg, qlab, dlab


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_map_equals_device_map(n_dev):
    mesh = make_mesh(n_dev)
    pq, pg, qlab, dlab = _data(n=1000, seed=n_dev)
    single = float(device_map_at_r(
        jnp.asarray(pq), jnp.asarray(pg), jnp.asarray(qlab), jnp.asarray(dlab),
        R=200, use_pallas=False,
    ))
    gal_t, dlab_pad, valid_n = shard_gallery_for_eval(mesh, pg, dlab)
    sharded = float(sharded_map_at_r(
        mesh, jnp.asarray(pq), gal_t, jnp.asarray(qlab), dlab_pad,
        R=200, valid_n=valid_n, use_pallas=False, slab=128,
    ))
    assert sharded == pytest.approx(single, abs=1e-6)


def test_sharded_map_with_ties_matches_oracle_order():
    """Tie-heavy codes: the sharded merge must preserve the oracle's
    (distance asc, index asc) order, so MAP matches exactly."""
    mesh = make_mesh(4)
    rng = np.random.default_rng(3)
    n, bits = 512, 16
    codes = np.where(rng.uniform(size=(n, bits)) < 0.1, -1.0, 1.0).astype(np.float32)
    pg = pack_codes_np(codes)
    pq = pack_codes_np(np.ones((9, bits), dtype=np.float32))
    dlab = np.eye(3, dtype=np.float32)[rng.integers(0, 3, n)]
    qlab = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 9)]
    single = float(device_map_at_r(
        jnp.asarray(pq), jnp.asarray(pg), jnp.asarray(qlab), jnp.asarray(dlab),
        R=100, use_pallas=False,
    ))
    gal_t, dlab_pad, valid_n = shard_gallery_for_eval(mesh, pg, dlab)
    sharded = float(sharded_map_at_r(
        mesh, jnp.asarray(pq), gal_t, jnp.asarray(qlab), dlab_pad,
        R=100, valid_n=valid_n, use_pallas=False, slab=64,
    ))
    assert sharded == pytest.approx(single, abs=1e-6)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_histograms_equal_device_histograms(n_dev):
    mesh = make_mesh(n_dev)
    pq, pg, qlab, dlab = _data(n=700, q=16, seed=n_dev + 10)
    nh, rh = device_distance_histograms(
        jnp.asarray(pq), jnp.asarray(pg.T), jnp.asarray(qlab), jnp.asarray(dlab),
        slab=128, use_pallas=False,
    )
    gal_t, dlab_pad, valid_n = shard_gallery_for_eval(mesh, pg, dlab)
    nh_s, rh_s = sharded_distance_histograms(
        mesh, jnp.asarray(pq), gal_t, jnp.asarray(qlab), dlab_pad,
        valid_n=valid_n, slab=64, use_pallas=False,
    )
    np.testing.assert_array_equal(np.asarray(nh), np.asarray(nh_s))
    np.testing.assert_array_equal(np.asarray(rh), np.asarray(rh_s))


def test_sharded_precision_at_radius_matches():
    mesh = make_mesh(8)
    pq, pg, qlab, dlab = _data(n=640, q=16, seed=42)
    single = float(device_precision_at_radius(
        jnp.asarray(pq), jnp.asarray(pg), jnp.asarray(qlab), jnp.asarray(dlab),
        radius=12, use_pallas=False,
    ))
    gal_t, dlab_pad, valid_n = shard_gallery_for_eval(mesh, pg, dlab)
    sharded = float(sharded_precision_at_radius(
        mesh, jnp.asarray(pq), gal_t, jnp.asarray(qlab), dlab_pad,
        radius=12, valid_n=valid_n, use_pallas=False,
    ))
    assert sharded == pytest.approx(single, abs=1e-6)


def test_experiment_evaluate_sharded_equals_single(tmp_path):
    """Experiment.evaluate under an 8-device mesh must agree with the
    mesh-free evaluation of the same experiment state."""
    import dataclasses as dc

    from hashgan_tpu.configs import Config, DataConfig, EncoderConfig, TrainConfig
    from hashgan_tpu.train.loop import Experiment

    cfg = Config(
        data=DataConfig(n_train=32, n_query=12, n_database=100, n_classes=4),
        encoder=EncoderConfig(arch="small_cnn", bits=16),
        train=TrainConfig(batch_size=8),
        use_gan=False,
        eval=dc.replace(Config().eval, pr_curve=False, R=50),
    )
    exp_mesh = Experiment(cfg, workdir=str(tmp_path / "m"), use_mesh=True)
    exp_solo = Experiment(cfg, workdir=str(tmp_path / "s"), use_mesh=False)
    # identical params (same seed/init) -> identical codes
    m1 = exp_mesh.evaluate()
    m2 = exp_solo.evaluate()
    for key in m1:
        assert m1[key] == pytest.approx(m2[key], abs=1e-6), key
