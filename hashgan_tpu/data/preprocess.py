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


def resize_images(images: jnp.ndarray, size: int) -> jnp.ndarray:
    """Bilinear resize to (size, size). No-op when already that size."""
    b, h, w, c = images.shape
    if h == size and w == size:
        return images
    return jax.image.resize(images, (b, size, size, c), method="bilinear")


def center_crop(images: jnp.ndarray, size: int) -> jnp.ndarray:
    """Static central crop to (size, size) — the reference's eval-time crop."""
    b, h, w, c = images.shape
    if h == size and w == size:
        return images
    y = (h - size) // 2
    x = (w - size) // 2
    return images[:, y : y + size, x : x + size, :]


def random_crop_to(rng: jax.Array, images: jnp.ndarray, size: int) -> jnp.ndarray:
    """Per-example random crop to (size, size) — the reference's train-time
    227 crop out of the 256 resize (SURVEY.md §3.5). Static shapes."""
    b, h, w, c = images.shape
    if h == size and w == size:
        return images
    ry = jax.random.randint(rng, (b,), 0, h - size + 1)
    rx = jax.random.randint(rng, (b,), 0, w - size + 1)

    def crop_one(img, y, x):
        return jax.lax.dynamic_slice(img, (y, x, 0), (size, size, c))

    return jax.vmap(crop_one)(images, ry, rx)


def alexnet_train_geometry(
    rng: jax.Array, images: jnp.ndarray, input_resize: int, resize_base: int = 0
) -> jnp.ndarray:
    """Reference train protocol: resize to ``resize_base`` then random-crop to
    ``input_resize``. ``resize_base`` <= ``input_resize`` degenerates to a
    plain resize."""
    base = max(resize_base, input_resize)
    images = resize_images(images, base)
    return random_crop_to(rng, images, input_resize)


def alexnet_eval_geometry(
    images: jnp.ndarray, input_resize: int, resize_base: int = 0
) -> jnp.ndarray:
    """Reference eval protocol: resize to ``resize_base``, center-crop."""
    base = max(resize_base, input_resize)
    images = resize_images(images, base)
    return center_crop(images, input_resize)


def random_crop(rng: jax.Array, images: jnp.ndarray, pad: int = 4) -> jnp.ndarray:
    """Pad-and-random-crop augmentation (static shapes; gather by index)."""
    b, h, w, c = images.shape
    padded = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    ry = jax.random.randint(rng, (b,), 0, 2 * pad + 1)
    rx = jax.random.randint(rng, (b,), 0, 2 * pad + 1)

    def crop_one(img, y, x):
        return jax.lax.dynamic_slice(img, (y, x, 0), (h, w, c))

    return jax.vmap(crop_one)(padded, ry, rx)
