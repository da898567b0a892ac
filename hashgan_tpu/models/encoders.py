"""Hash encoders F: image -> b continuous codes in (-1, 1).

Reference parity (SURVEY.md C9): the reference's F is AlexNet (ImageNet
weights) with fc8 replaced by a b-unit tanh "hash layer". Here the hash head
is a shared module and three backbones plug into it:

- SmallCNNEncoder: compact conv net for fast CIFAR-scale runs (config 1).
- AlexNetEncoder (models/alexnet.py): faithful AlexNet with optional
  bvlc_alexnet.npy weight loading (config 2/3).
- ResNetEncoder: deeper backbone for ImageNet-100 (config 4).

All are stateless (GroupNorm, no BatchNorm) so the encoder train step needs
no mutable collections; outputs are f32 tanh codes ready for the WML loss
and sign->bitpack.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class HashHead(nn.Module):
    """The b-unit tanh hash layer (the reference's replaced fc8)."""

    bits: int

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(
            self.bits,
            kernel_init=nn.initializers.normal(0.01),
            name="hash_fc",
        )(features.astype(jnp.float32))
        return jnp.tanh(h)


class SmallCNNEncoder(nn.Module):
    """3-stage conv net for 32x32-scale images."""

    bits: int = 32
    dim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        h = x.astype(self.dtype) / 127.5  # inputs are mean-subtracted uint8-scale
        for i, mult in enumerate((1, 2, 4)):
            h = nn.Conv(self.dim * mult, (3, 3), dtype=self.dtype, name=f"conv{i}a")(h)
            h = nn.GroupNorm(num_groups=8, dtype=self.dtype)(h)
            h = nn.relu(h)
            h = nn.Conv(self.dim * mult, (3, 3), dtype=self.dtype, name=f"conv{i}b")(h)
            h = nn.GroupNorm(num_groups=8, dtype=self.dtype)(h)
            h = nn.relu(h)
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        h = h.mean(axis=(1, 2))
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="fc")(h)
        h = nn.relu(h)
        return HashHead(self.bits, name="hash")(h)


class ResNetBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            dtype=self.dtype, name="conv1",
        )(x)
        h = nn.GroupNorm(num_groups=32, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv2")(h)
        h = nn.GroupNorm(num_groups=32, dtype=self.dtype)(h)
        skip = x
        if self.stride != 1 or x.shape[-1] != self.features:
            skip = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                dtype=self.dtype, name="skip",
            )(x)
        return nn.relu(h + skip)


class ResNetEncoder(nn.Module):
    """ResNet-18-shaped backbone + hash head (config 4 backbone)."""

    bits: int = 64
    dim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        h = x.astype(self.dtype) / 127.5
        h = nn.Conv(self.dim, (3, 3), dtype=self.dtype, name="stem")(h)
        h = nn.GroupNorm(num_groups=32, dtype=self.dtype)(h)
        h = nn.relu(h)
        for stage, mult in enumerate((1, 2, 4, 8)):
            stride = 1 if stage == 0 else 2
            h = ResNetBlock(self.dim * mult, stride=stride, dtype=self.dtype,
                            name=f"s{stage}b0")(h)
            h = ResNetBlock(self.dim * mult, dtype=self.dtype, name=f"s{stage}b1")(h)
        h = h.mean(axis=(1, 2))
        # Residual-stream magnitude grows with depth; normalize the pooled
        # embedding so the 10x-lr hash layer can't saturate tanh in a few
        # steps (observed: |codes| -> 1.0 and frozen training at 100 classes).
        h = nn.LayerNorm(dtype=jnp.float32, name="embed_norm")(
            h.astype(jnp.float32)
        )
        return HashHead(self.bits, name="hash")(h)


def build_encoder(
    arch: str, bits: int, dtype: Dtype = jnp.float32, input_resize: int = 0
) -> nn.Module:
    """``input_resize`` (reference: 227) makes the AlexNet module resize any
    mismatched input as a safety net; the train/encode steps apply the full
    resize-base/crop protocol before the forward pass (train/hash_step.py)."""
    from hashgan_tpu.models.alexnet import AlexNetEncoder

    if arch == "small_cnn":
        return SmallCNNEncoder(bits=bits, dtype=dtype)
    if arch == "alexnet":
        return AlexNetEncoder(bits=bits, dtype=dtype, input_resize=input_resize)
    if arch == "resnet":
        return ResNetEncoder(bits=bits, dtype=dtype)
    raise ValueError(f"unknown encoder arch {arch!r}")
