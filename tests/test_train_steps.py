import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hashgan_tpu.configs import Config, DataConfig, EncoderConfig, GanConfig, TrainConfig
from hashgan_tpu.data import make_splits
from hashgan_tpu.data.pipeline import BatchIterator
from hashgan_tpu.models import Discriminator, Generator, SmallCNNEncoder
from hashgan_tpu.train import (
    create_encoder_state,
    create_gan_state,
    make_encoder_train_step,
    make_gan_cycle,
)
from hashgan_tpu.train.hash_step import make_encode_fn


def tiny_config(use_gan=False):
    return Config(
        data=DataConfig(n_train=128, n_query=16, n_database=64, n_classes=4),
        gan=GanConfig(dim=16, z_dim=32, n_critic=2, iters=100),
        encoder=EncoderConfig(arch="small_cnn", bits=16, lr=1e-3),
        train=TrainConfig(batch_size=16, fake_ratio=0.5),
        use_gan=use_gan,
    )


def test_encoder_step_loss_decreases():
    cfg = tiny_config()
    splits = make_splits(cfg.data)
    enc = SmallCNNEncoder(bits=cfg.encoder.bits, dim=16)
    state = create_encoder_state(jax.random.key(0), enc, cfg.encoder, (32, 32, 3))
    step = make_encoder_train_step(enc, cfg)
    it = BatchIterator(splits["train"], cfg.train.batch_size, seed=0)
    losses = []
    rng = jax.random.key(1)
    for _ in range(60):
        imgs, labs = next(it)
        state, metrics = step(state, jnp.asarray(imgs), jnp.asarray(labs), rng)
        losses.append(float(metrics["pair_nll"]))
    assert int(state.step) == 60
    # pair NLL (not the total incl. the noisy balance term) must trend down
    assert np.mean(losses[-10:]) < np.mean(losses[:10]), losses


def test_encoder_codes_separate_classes():
    """After a short train run, same-class codes are closer than cross-class."""
    cfg = tiny_config()
    splits = make_splits(cfg.data)
    enc = SmallCNNEncoder(bits=cfg.encoder.bits, dim=16)
    state = create_encoder_state(jax.random.key(0), enc, cfg.encoder, (32, 32, 3))
    step = make_encoder_train_step(enc, cfg)
    it = BatchIterator(splits["train"], cfg.train.batch_size, seed=0)
    rng = jax.random.key(1)
    for _ in range(60):
        imgs, labs = next(it)
        state, _ = step(state, jnp.asarray(imgs), jnp.asarray(labs), rng)
    encode = make_encode_fn(enc)
    q = splits["query"]
    codes = np.sign(np.asarray(encode(state.params, jnp.asarray(q.images))))
    same = cross = n_same = n_cross = 0.0
    for i in range(len(q)):
        for j in range(i + 1, len(q)):
            d = (codes[i] != codes[j]).sum()
            if (q.labels[i] * q.labels[j]).sum() > 0:
                same += d; n_same += 1
            else:
                cross += d; n_cross += 1
    assert same / max(n_same, 1) < cross / max(n_cross, 1)


def test_gan_cycle_runs_and_updates():
    cfg = tiny_config(use_gan=True)
    gen = Generator(image_size=32, n_labels=4, dim=16)
    disc = Discriminator(image_size=32, n_labels=4, dim=16)
    state = create_gan_state(
        jax.random.key(0), gen, disc, cfg.gan, (32, 32, 3), 4
    )
    g0 = jax.tree_util.tree_map(np.asarray, state.g_params)
    cycle = make_gan_cycle(gen, disc, cfg)
    n, b = cfg.gan.n_critic + 1, 8
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (n, b, 32, 32, 3)), dtype=jnp.uint8)
    labs = jnp.asarray(np.eye(4)[rng.integers(0, 4, (n, b))], dtype=jnp.float32)
    state, metrics = cycle(state, imgs, labs, jax.random.key(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    assert int(state.step) == 1
    # generator params actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b_: float(np.abs(np.asarray(a) - b_).max()), state.g_params, g0
    )
    total = max(jax.tree_util.tree_leaves(moved))
    assert total > 0
    # second invocation works (donated buffers)
    state, metrics = cycle(state, imgs, labs, jax.random.key(1))
    assert int(state.step) == 2
    assert float(metrics["grad_penalty"]) < 10.0  # GP magnitude sane


def test_encoder_step_with_gan_samples():
    cfg = tiny_config(use_gan=True)
    splits = make_splits(cfg.data)
    enc = SmallCNNEncoder(bits=cfg.encoder.bits, dim=16)
    gen = Generator(image_size=32, n_labels=4, dim=16)
    disc = Discriminator(image_size=32, n_labels=4, dim=16)
    gstate = create_gan_state(jax.random.key(0), gen, disc, cfg.gan, (32, 32, 3), 4)
    estate = create_encoder_state(jax.random.key(1), enc, cfg.encoder, (32, 32, 3))
    step = make_encoder_train_step(enc, cfg, generator=gen)
    it = BatchIterator(splits["train"], cfg.train.batch_size, seed=0)
    imgs, labs = next(it)
    estate, metrics = step(
        estate, jnp.asarray(imgs), jnp.asarray(labs), jax.random.key(2),
        gstate.g_params, gstate.g_stats,
    )
    assert np.isfinite(float(metrics["hash_loss"]))
    assert int(estate.step) == 1


def test_gan_ema_tracks_generator():
    import dataclasses as dc

    cfg = tiny_config(use_gan=True)
    cfg = dc.replace(cfg, gan=dc.replace(cfg.gan, ema_decay=0.9))
    gen = Generator(image_size=32, n_labels=4, dim=16)
    disc = Discriminator(image_size=32, n_labels=4, dim=16)
    state = create_gan_state(jax.random.key(0), gen, disc, cfg.gan, (32, 32, 3), 4)
    assert state.g_ema is not None
    cycle = make_gan_cycle(gen, disc, cfg)
    rng = np.random.default_rng(0)
    n, b = cfg.gan.n_critic + 1, 8
    imgs = jnp.asarray(rng.integers(0, 255, (n, b, 32, 32, 3)), dtype=jnp.uint8)
    labs = jnp.asarray(np.eye(4)[rng.integers(0, 4, (n, b))], dtype=jnp.float32)
    state, _ = cycle(state, imgs, labs, jax.random.key(1))
    # EMA moved toward params but is not equal to them
    diffs = jax.tree_util.tree_map(
        lambda e, p: float(np.abs(np.asarray(e) - np.asarray(p)).max()),
        state.g_ema, state.g_params,
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 0
