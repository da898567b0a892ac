"""Config-3-shaped coverage: NUS-WIDE-like multi-label, 64x64 GAN + encoder."""

import pytest

pytestmark = pytest.mark.slow  # full-loop integration tests; -m 'not slow' skips
import jax
import jax.numpy as jnp
import numpy as np

from hashgan_tpu.configs import (
    Config, DataConfig, EncoderConfig, GanConfig, TrainConfig,
)
from hashgan_tpu.data import make_splits
from hashgan_tpu.data.pipeline import BatchIterator
from hashgan_tpu.models import Discriminator, Generator, SmallCNNEncoder
from hashgan_tpu.train import (
    create_encoder_state, create_gan_state, make_encoder_train_step,
    make_gan_cycle,
)


def _cfg():
    return Config(
        data=DataConfig(
            name="nuswide", n_classes=7, multi_label=True, image_size=64,
            n_train=64, n_query=8, n_database=32,
        ),
        gan=GanConfig(dim=8, z_dim=16, n_critic=2, iters=10,
                      compute_dtype="float32"),
        encoder=EncoderConfig(arch="small_cnn", bits=32,
                              compute_dtype="float32"),
        train=TrainConfig(batch_size=8, fake_ratio=0.5),
        use_gan=True,
    )


def test_multilabel_gan_cycle_and_encoder_step():
    cfg = _cfg()
    splits = make_splits(cfg.data)
    assert splits["train"].images.shape[1:] == (64, 64, 3)
    gen = Generator(image_size=64, n_labels=7, dim=8)
    disc = Discriminator(image_size=64, n_labels=7, dim=8)
    enc = SmallCNNEncoder(bits=32, dim=16)
    gstate = create_gan_state(
        jax.random.key(0), gen, disc, cfg.gan, (64, 64, 3), 7
    )
    cycle = make_gan_cycle(gen, disc, cfg)
    it = BatchIterator(splits["train"], cfg.train.batch_size * 3, seed=0)
    imgs, labs = next(it)
    imgs = jnp.asarray(imgs.reshape(3, 8, 64, 64, 3))
    labs = jnp.asarray(labs.reshape(3, 8, 7))
    gstate, metrics = cycle(gstate, imgs, labs, jax.random.key(1))
    for key, v in metrics.items():
        assert np.isfinite(float(v)), (key, float(v))

    estate = create_encoder_state(jax.random.key(2), enc, cfg.encoder,
                                  (64, 64, 3))
    step = make_encoder_train_step(enc, cfg, generator=gen)
    it2 = BatchIterator(splits["train"], cfg.train.batch_size, seed=1)
    imgs2, labs2 = next(it2)
    estate, m2 = step(
        estate, jnp.asarray(imgs2), jnp.asarray(labs2), jax.random.key(3),
        gstate.g_params, gstate.g_stats,
    )
    assert np.isfinite(float(m2["hash_loss"]))


def test_multilabel_similarity_used_in_eval():
    """Multi-label relevance (share >= 1 concept) flows through device MAP."""
    from hashgan_tpu.eval import device_map_at_r
    from hashgan_tpu.ops import pack_codes_np

    rng = np.random.default_rng(0)
    codes_q = rng.standard_normal((8, 32)).astype(np.float32)
    codes_g = rng.standard_normal((50, 32)).astype(np.float32)
    qlab = (rng.random((8, 7)) < 0.3).astype(np.float32)
    dlab = (rng.random((50, 7)) < 0.3).astype(np.float32)
    qlab[0] = 0  # query with no labels: never relevant -> AP 0 contribution
    m = float(device_map_at_r(
        jnp.asarray(pack_codes_np(codes_q)), jnp.asarray(pack_codes_np(codes_g)),
        jnp.asarray(qlab), jnp.asarray(dlab), R=20, use_pallas=False,
    ))
    assert 0.0 <= m <= 1.0
