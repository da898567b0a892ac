"""Data-parallel semantic equivalence: the same global batch must produce
the same loss/gradients whether it runs on 1 device or sharded over 8
(GSPMD inserts the psum; batch statistics are global either way)."""

import pytest

pytestmark = pytest.mark.slow  # full-loop integration tests; -m 'not slow' skips
import jax
import jax.numpy as jnp
import numpy as np

from hashgan_tpu.configs import Config, DataConfig, EncoderConfig, GanConfig, TrainConfig
from hashgan_tpu.models import Discriminator, Generator, SmallCNNEncoder
from hashgan_tpu.parallel import make_mesh, replicate, shard_batch
from hashgan_tpu.train import (
    create_encoder_state,
    create_gan_state,
    make_encoder_train_step,
    make_gan_cycle,
)


def _cfg():
    return Config(
        data=DataConfig(n_classes=4),
        gan=GanConfig(dim=8, z_dim=16, n_critic=2, iters=100,
                      compute_dtype="float32"),
        encoder=EncoderConfig(arch="small_cnn", bits=16,
                              compute_dtype="float32"),
        train=TrainConfig(batch_size=16, fake_ratio=0.5),
        use_gan=False,
    )


def _batch(rng, b, n_cls=4, size=32):
    imgs = rng.integers(0, 255, (b, size, size, 3), dtype=np.uint8)
    labs = np.eye(n_cls, dtype=np.float32)[rng.integers(0, n_cls, b)]
    return imgs, labs


def test_encoder_step_matches_across_mesh_sizes():
    cfg = _cfg()
    enc = SmallCNNEncoder(bits=16, dim=16)
    rng = np.random.default_rng(0)
    imgs, labs = _batch(rng, 16)

    results = {}
    for n_dev in (1, 8):
        mesh = make_mesh(n_dev)
        state = create_encoder_state(jax.random.key(0), enc, cfg.encoder,
                                     (32, 32, 3))
        state = replicate(mesh, state)
        batch = shard_batch(mesh, (jnp.asarray(imgs), jnp.asarray(labs)))
        step = make_encoder_train_step(enc, cfg)
        state, metrics = step(state, batch[0], batch[1], jax.random.key(1))
        results[n_dev] = (
            jax.device_get(metrics),
            jax.device_get(state.params),
        )

    m1, p1 = results[1]
    m8, p8 = results[8]
    for key in m1:
        assert abs(float(m1[key]) - float(m8[key])) < 1e-4, key
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()), p1, p8
    )
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-4


def test_gan_cycle_matches_across_mesh_sizes():
    cfg = _cfg()
    gen = Generator(image_size=32, n_labels=4, dim=8)
    disc = Discriminator(image_size=32, n_labels=4, dim=8)
    rng = np.random.default_rng(1)
    n_b = cfg.gan.n_critic + 1
    imgs = rng.integers(0, 255, (n_b, 16, 32, 32, 3), dtype=np.uint8)
    labs = np.eye(4, dtype=np.float32)[rng.integers(0, 4, (n_b, 16))]

    results = {}
    for n_dev in (1, 8):
        mesh = make_mesh(n_dev)
        state = replicate(mesh, create_gan_state(
            jax.random.key(0), gen, disc, cfg.gan, (32, 32, 3), 4
        ))
        sh = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, "data")
        )
        b = (jax.device_put(jnp.asarray(imgs), sh),
             jax.device_put(jnp.asarray(labs), sh))
        cycle = make_gan_cycle(gen, disc, cfg)
        state, metrics = cycle(state, b[0], b[1], jax.random.key(2))
        results[n_dev] = jax.device_get(metrics)

    for key in results[1]:
        a, c = float(results[1][key]), float(results[8][key])
        assert abs(a - c) < 2e-3 * max(1.0, abs(a)), (key, a, c)


def test_encode_dataset_sharded_equals_single():
    """Mesh-sharded encoding (batch-partitioned forward) matches
    single-device encoding to f32 rounding (partitioned matmuls may sum in
    a different order, so bit-exactness is not guaranteed)."""
    import jax
    import numpy as np

    from hashgan_tpu.data.synthetic import make_synthetic
    from hashgan_tpu.models import SmallCNNEncoder
    from hashgan_tpu.parallel import make_mesh
    from hashgan_tpu.train.hash_step import encode_dataset, make_encode_fn

    ds, _ = make_synthetic(70, 4, size=16, seed=0)  # ragged final batch
    enc = SmallCNNEncoder(bits=16, dim=16)
    params = enc.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        np.zeros((2, 16, 16, 3), np.float32), train=False,
    )["params"]
    fn = make_encode_fn(enc)
    solo = encode_dataset(fn, params, ds, batch_size=32, mesh=None)
    mesh = make_mesh(8)
    sharded = encode_dataset(fn, params, ds, batch_size=32, mesh=mesh)
    assert solo.shape == sharded.shape
    np.testing.assert_allclose(solo, sharded, atol=5e-6)
