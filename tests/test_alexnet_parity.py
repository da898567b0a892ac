"""AlexNet/bvlc 227px reference-protocol parity (SURVEY.md C9, §3.5).

Covers: the bvlc_alexnet.npy loader (fake-npy roundtrip — conv kernels land,
mismatched layers stay initialized), the 227 input geometry (resize-256 ->
random/center crop), and the config threading (EncoderConfig.input_resize ->
build_encoder / train / encode steps)."""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-loop integration tests; -m 'not slow' skips

from hashgan_tpu.configs import Config, DataConfig, EncoderConfig, TrainConfig
from hashgan_tpu.data.preprocess import (
    alexnet_eval_geometry,
    alexnet_train_geometry,
    center_crop,
    random_crop_to,
    resize_images,
)
from hashgan_tpu.models import build_encoder
from hashgan_tpu.models.alexnet import load_bvlc_weights


# bvlc_alexnet.npy layer shapes in the caffe-tensorflow HWIO layout
# (conv2/4/5 are grouped: in-channels halved).
_BVLC_SHAPES = {
    "conv1": ((11, 11, 3, 96), (96,)),
    "conv2": ((5, 5, 48, 256), (256,)),
    "conv3": ((3, 3, 256, 384), (384,)),
    "conv4": ((3, 3, 192, 384), (384,)),
    "conv5": ((3, 3, 192, 256), (256,)),
    "fc6": ((9216, 4096), (4096,)),
    "fc7": ((4096, 4096), (4096,)),
}


def _fake_bvlc_npy(path):
    rng = np.random.default_rng(0)
    blobs = {
        name: [
            rng.standard_normal(wshape).astype(np.float32),
            rng.standard_normal(bshape).astype(np.float32),
        ]
        for name, (wshape, bshape) in _BVLC_SHAPES.items()
    }
    np.save(path, np.asarray(blobs, dtype=object), allow_pickle=True)
    return blobs


@pytest.fixture(scope="module")
def alexnet_227_params():
    enc = build_encoder("alexnet", bits=48, input_resize=227)
    dummy = jnp.zeros((1, 227, 227, 3), jnp.float32)
    variables = enc.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                         dummy, train=False)
    return enc, variables["params"]


def test_alexnet_227_fc6_flatten_matches_bvlc(alexnet_227_params):
    _, params = alexnet_227_params
    # 227 -> conv1(11/4 VALID)=55 -> pool=27 -> pool=13 -> pool=6 -> 6*6*256
    assert params["fc6"]["kernel"].shape == (9216, 4096)
    assert params["conv2"]["kernel"].shape == (5, 5, 48, 256)  # grouped


def test_bvlc_loader_roundtrip(alexnet_227_params, tmp_path):
    enc, params = alexnet_227_params
    npy = tmp_path / "bvlc_alexnet.npy"
    blobs = _fake_bvlc_npy(str(npy))
    loaded = load_bvlc_weights(params, str(npy))
    for name in _BVLC_SHAPES:
        np.testing.assert_array_equal(
            np.asarray(loaded[name]["kernel"]), blobs[name][0], err_msg=name
        )
        np.testing.assert_array_equal(
            np.asarray(loaded[name]["bias"]), blobs[name][1], err_msg=name
        )
    # the new hash layer stays at its initialization (the reference always
    # re-initializes fc8)
    np.testing.assert_array_equal(
        np.asarray(loaded["hash"]["hash_fc"]["kernel"]),
        np.asarray(params["hash"]["hash_fc"]["kernel"]),
    )


def test_bvlc_loader_shape_mismatch_keeps_init(alexnet_227_params, tmp_path):
    """At non-227 input sizes fc6's flatten dim differs: the loader must
    leave fc6/fc7 at their initialized values and still load the convs."""
    enc = build_encoder("alexnet", bits=16)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = enc.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                      dummy, train=False)["params"]
    npy = tmp_path / "bvlc_alexnet.npy"
    blobs = _fake_bvlc_npy(str(npy))
    loaded = load_bvlc_weights(params, str(npy))
    np.testing.assert_array_equal(
        np.asarray(loaded["conv1"]["kernel"]), blobs["conv1"][0]
    )
    np.testing.assert_array_equal(  # fc6 shape mismatched -> untouched
        np.asarray(loaded["fc6"]["kernel"]), np.asarray(params["fc6"]["kernel"])
    )


def test_bvlc_loader_missing_file_raises(alexnet_227_params):
    _, params = alexnet_227_params
    with pytest.raises(FileNotFoundError):
        load_bvlc_weights(params, "/nonexistent/bvlc.npy")


# ----------------------------------------------------------------------------
# Geometry: resize 256 -> crop 227 protocol
# ----------------------------------------------------------------------------

def test_geometry_shapes_and_crop_bounds():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (4, 32, 32, 3)).astype(np.float32))
    out = alexnet_train_geometry(jax.random.key(0), x, 227, 256)
    assert out.shape == (4, 227, 227, 3)
    out = alexnet_eval_geometry(x, 227, 256)
    assert out.shape == (4, 227, 227, 3)
    # degenerate: base <= target -> plain resize
    out = alexnet_train_geometry(jax.random.key(0), x, 64, 0)
    assert out.shape == (4, 64, 64, 3)


def test_center_crop_takes_center():
    x = jnp.zeros((1, 8, 8, 1)).at[:, 3:5, 3:5, :].set(1.0)
    out = center_crop(x, 2)
    np.testing.assert_array_equal(np.asarray(out), np.ones((1, 2, 2, 1)))


def test_random_crop_to_is_a_true_window():
    rng = np.random.default_rng(1)
    base = rng.uniform(0, 1, (2, 12, 12, 3)).astype(np.float32)
    x = jnp.asarray(base)
    out = np.asarray(random_crop_to(jax.random.key(3), x, 8))
    assert out.shape == (2, 8, 8, 3)
    # each output must be an exact 8x8 window of its input
    for b in range(2):
        found = False
        for y in range(5):
            for xx in range(5):
                if np.array_equal(out[b], base[b, y : y + 8, xx : xx + 8]):
                    found = True
        assert found


def test_resize_images_noop_at_same_size():
    x = jnp.ones((2, 16, 16, 3))
    assert resize_images(x, 16) is x


# ----------------------------------------------------------------------------
# End-to-end: the 227 protocol through the encoder train/encode steps
# ----------------------------------------------------------------------------

def test_encoder_step_runs_227_protocol_on_small_images():
    """config2/3-style run: 32px data, encoder.input_resize=227 — the train
    step resizes+crops on device and fc6 sees the bvlc flatten size."""
    from hashgan_tpu.train import create_encoder_state, make_encoder_train_step
    from hashgan_tpu.train.hash_step import make_encode_fn

    cfg = Config(
        data=DataConfig(n_train=8, n_query=4, n_database=8, n_classes=2),
        encoder=EncoderConfig(
            arch="alexnet", bits=16, input_resize=227, resize_base=256,
        ),
        train=TrainConfig(batch_size=4),
        use_gan=False,
    )
    enc = build_encoder("alexnet", bits=16, input_resize=227)
    state = create_encoder_state(
        jax.random.key(0), enc, cfg.encoder, (227, 227, 3)
    )
    step = make_encoder_train_step(enc, cfg)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (4, 32, 32, 3)), dtype=jnp.uint8)
    labs = jnp.asarray(np.eye(2)[rng.integers(0, 2, 4)], dtype=jnp.float32)
    state, metrics = step(state, imgs, labs, jax.random.key(1))
    assert np.isfinite(float(metrics["hash_loss"]))
    codes = make_encode_fn(enc, cfg)(state.params, imgs)
    assert codes.shape == (4, 16)
    assert np.isfinite(np.asarray(codes)).all()
