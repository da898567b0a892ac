import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hashgan_tpu.models import (
    AlexNetEncoder,
    CondBatchNorm,
    Discriminator,
    Generator,
    ResNetEncoder,
    SmallCNNEncoder,
    build_encoder,
)


def test_cond_batchnorm_zero_tables_is_plain_bn():
    """gamma(y)=1, beta(y)=0 at init -> output equals unscaled BN."""
    rng = jax.random.key(0)
    x = jax.random.normal(rng, (8, 4, 4, 6))
    y = jnp.asarray(np.eye(3)[np.arange(8) % 3], dtype=jnp.float32)
    m = CondBatchNorm(n_labels=3)
    vars_ = m.init(rng, x, y)
    out, _ = m.apply(vars_, x, y, mutable=["batch_stats"])
    mean = np.asarray(out).mean(axis=(0, 1, 2))
    std = np.asarray(out).std(axis=(0, 1, 2))
    assert np.abs(mean).max() < 1e-5
    assert np.abs(std - 1.0).max() < 1e-2


def test_cond_batchnorm_labels_select_affine():
    rng = jax.random.key(1)
    x = jnp.ones((4, 2, 2, 5))
    y = jnp.asarray(np.eye(2)[[0, 0, 1, 1]], dtype=jnp.float32)
    m = CondBatchNorm(n_labels=2)
    vars_ = m.init(rng, x, y)
    # set class-0 beta to +10, class-1 beta to -10
    beta = np.zeros((2, 5), np.float32)
    beta[0], beta[1] = 10.0, -10.0
    vars_ = {
        "params": {**vars_["params"], "beta": jnp.asarray(beta)},
        "batch_stats": vars_["batch_stats"],
    }
    out, _ = m.apply(vars_, x, y, mutable=["batch_stats"])
    out = np.asarray(out)
    assert (out[:2] > 5).all() and (out[2:] < -5).all()


@pytest.mark.parametrize("size", [32, 64])
def test_generator_shapes_and_range(size):
    g = Generator(image_size=size, n_labels=4, dim=16)
    z = jax.random.normal(jax.random.key(0), (2, 128))
    y = jnp.asarray(np.eye(4)[[0, 1]], dtype=jnp.float32)
    vars_ = g.init(jax.random.key(1), z, y, train=True)
    img, updates = g.apply(vars_, z, y, train=True, mutable=["batch_stats"])
    assert img.shape == (2, size, size, 3)
    assert float(jnp.abs(img).max()) <= 1.0
    assert "batch_stats" in updates
    # eval mode uses running averages, no mutation needed
    img_eval = g.apply(vars_, z, y, train=False)
    assert img_eval.shape == (2, size, size, 3)


@pytest.mark.parametrize("size", [32, 64])
def test_discriminator_shapes(size):
    d = Discriminator(image_size=size, n_labels=7, dim=16)
    x = jax.random.normal(jax.random.key(0), (3, size, size, 3))
    vars_ = d.init(jax.random.key(1), x)
    score, aux = d.apply(vars_, x)
    assert score.shape == (3,)
    assert aux.shape == (3, 7)


def test_discriminator_per_sample_independence():
    """Required for the gradient penalty: D(x)[i] must not depend on x[j]."""
    d = Discriminator(image_size=32, n_labels=3, dim=8)
    x = jax.random.normal(jax.random.key(0), (4, 32, 32, 3))
    vars_ = d.init(jax.random.key(1), x)
    s0, _ = d.apply(vars_, x)
    x2 = x.at[2].set(jax.random.normal(jax.random.key(2), (32, 32, 3)))
    s1, _ = d.apply(vars_, x2)
    diff = np.abs(np.asarray(s0) - np.asarray(s1))
    assert diff[2] > 1e-6          # perturbed sample changed
    others = np.delete(diff, 2)
    assert others.max() < 1e-5     # others did not


@pytest.mark.parametrize(
    "cls,kwargs,size",
    [
        (SmallCNNEncoder, dict(bits=32, dim=16), 32),
        (ResNetEncoder, dict(bits=64, dim=32), 32),
        (AlexNetEncoder, dict(bits=48), 64),
    ],
)
def test_encoders_shapes_and_tanh_range(cls, kwargs, size):
    enc = cls(**kwargs)
    x = jax.random.normal(jax.random.key(0), (2, size, size, 3)) * 50
    vars_ = enc.init({"params": jax.random.key(1), "dropout": jax.random.key(2)},
                     x, train=False)
    codes = enc.apply(vars_, x, train=False)
    assert codes.shape == (2, kwargs["bits"])
    assert float(jnp.abs(codes).max()) < 1.0
    assert "hash" in vars_["params"]  # hash head subtree (10x lr mask target)


def test_build_encoder_dispatch():
    assert isinstance(build_encoder("small_cnn", 32), SmallCNNEncoder)
    assert isinstance(build_encoder("alexnet", 48), AlexNetEncoder)
    assert isinstance(build_encoder("resnet", 64), ResNetEncoder)
    with pytest.raises(ValueError):
        build_encoder("vgg", 32)
