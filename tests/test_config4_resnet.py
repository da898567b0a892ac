"""Config-4-shaped coverage: ImageNet-100-like, ResNet backbone, 64x64."""

import pytest

pytestmark = pytest.mark.slow  # full-loop integration tests; -m 'not slow' skips
import jax
import jax.numpy as jnp
import numpy as np

from hashgan_tpu.configs import Config, DataConfig, EncoderConfig, TrainConfig
from hashgan_tpu.data import make_splits
from hashgan_tpu.data.pipeline import BatchIterator
from hashgan_tpu.models import ResNetEncoder
from hashgan_tpu.train import create_encoder_state, make_encoder_train_step
from hashgan_tpu.train.hash_step import make_encode_fn


def test_resnet_encoder_trains_at_64px_many_classes():
    cfg = Config(
        data=DataConfig(
            name="imagenet100", n_classes=20, image_size=64,
            n_train=64, n_query=8, n_database=16,
        ),
        encoder=EncoderConfig(arch="resnet", bits=64, compute_dtype="float32"),
        train=TrainConfig(batch_size=8),
        use_gan=False,
    )
    splits = make_splits(cfg.data)
    enc = ResNetEncoder(bits=64, dim=32)
    state = create_encoder_state(jax.random.key(0), enc, cfg.encoder, (64, 64, 3))
    step = make_encoder_train_step(enc, cfg)
    it = BatchIterator(splits["train"], 8, seed=0)
    for _ in range(3):
        imgs, labs = next(it)
        state, m = step(state, jnp.asarray(imgs), jnp.asarray(labs),
                        jax.random.key(1))
        assert np.isfinite(float(m["hash_loss"]))
    codes = make_encode_fn(enc)(state.params, jnp.asarray(splits["query"].images))
    assert codes.shape == (8, 64)
    assert float(jnp.abs(codes).max()) < 1.0
