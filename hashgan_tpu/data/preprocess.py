"""On-device preprocessing (runs inside jitted train/eval steps).

Reference parity (SURVEY.md C9, C15): the reference preprocesses on host
(GAN path: uint8 -> [-1, 1]; AlexNet path: resize 256 / crop 227 / mean-
subtract / random flip). On TPU the right split is: ship uint8, normalize on
device where it fuses into the first conv. Random crop/flip augmentation is
expressed with jax.random so it is jittable and reproducible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# BGR means of bvlc_alexnet's training set, kept for parity with the
# reference AlexNet path (applied in RGB order here).
ALEXNET_MEAN_RGB = (122.7717, 115.9465, 102.9801)


def to_gan_range(images_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] -> float32 [-1, 1] (G's tanh output range)."""
    return images_u8.astype(jnp.float32) / 127.5 - 1.0


def from_gan_range(images: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] -> uint8 [0, 255] for image dumps."""
    return jnp.clip((images + 1.0) * 127.5, 0, 255).astype(jnp.uint8)


def to_encoder_input(images_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 -> mean-subtracted float32 (AlexNet-style normalization)."""
    mean = jnp.asarray(ALEXNET_MEAN_RGB, dtype=jnp.float32)
    return images_u8.astype(jnp.float32) - mean


def gan_to_encoder_input(images_gan: jnp.ndarray) -> jnp.ndarray:
    """G output in [-1,1] -> encoder input, staying on device (stage II
    trains F on real + synthetic in one batch; SURVEY.md §3.2)."""
    mean = jnp.asarray(ALEXNET_MEAN_RGB, dtype=jnp.float32)
    return (images_gan + 1.0) * 127.5 - mean


def random_flip(rng: jax.Array, images: jnp.ndarray) -> jnp.ndarray:
    """Per-example horizontal flip."""
    flip = jax.random.bernoulli(rng, 0.5, (images.shape[0], 1, 1, 1))
    return jnp.where(flip, images[:, :, ::-1, :], images)


def random_crop(rng: jax.Array, images: jnp.ndarray, pad: int = 4) -> jnp.ndarray:
    """Pad-and-random-crop augmentation (static shapes; gather by index)."""
    b, h, w, c = images.shape
    padded = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    ry = jax.random.randint(rng, (b,), 0, 2 * pad + 1)
    rx = jax.random.randint(rng, (b,), 0, 2 * pad + 1)

    def crop_one(img, y, x):
        return jax.lax.dynamic_slice(img, (y, x, 0), (h, w, c))

    return jax.vmap(crop_one)(padded, ry, rx)
