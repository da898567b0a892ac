"""PC-WGAN generator and critic (Flax, NHWC, bf16-on-MXU friendly).

Reference parity (SURVEY.md C8, §3.1): ResNet G and D in the
improved-wgan-training style — G: linear z -> 4x4 feature map -> conditional-
BatchNorm residual up-blocks -> tanh image; D: optimized input block ->
residual down/plain blocks -> ReLU -> global mean-pool -> scalar critic score
plus an ACGAN-style auxiliary label head. The critic uses LayerNorm or no
norm (BatchNorm is invalid under the WGAN gradient penalty); per-sample
independence of D(x) is what makes the GP term well-defined.

TPU-first choices: NHWC layouts, nearest-neighbor-upsample + 3x3 conv
(instead of transposed conv — same function class, better XLA fusion),
mean-pool downsample, computations in a configurable ``dtype`` (bfloat16 by
default in configs) with f32 params and f32 critic/aux outputs.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from hashgan_tpu.models.layers import CondBatchNorm

Dtype = Any


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample, NHWC."""
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def _meanpool2x(x: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(2, 4))


class GenResBlock(nn.Module):
    """Conditional-BN residual block with 2x upsample."""

    features: int
    n_labels: int
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, labels: jnp.ndarray, train: bool = True
    ) -> jnp.ndarray:
        h = CondBatchNorm(
            self.n_labels, use_running_average=not train,
            axis_name=self.axis_name,
        )(x, labels)
        h = nn.relu(h)
        h = _upsample2x(h)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv1")(h)
        h = CondBatchNorm(
            self.n_labels, use_running_average=not train,
            axis_name=self.axis_name,
        )(h, labels)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv2")(h)
        skip = _upsample2x(x)
        if skip.shape[-1] != self.features:
            skip = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="skip")(skip)
        return h + skip


class Generator(nn.Module):
    """z, label-condition -> image in [-1, 1].

    Conditioning enters twice: a label embedding concatenated to z (drives
    the global layout) and conditional BatchNorm in every up-block (drives
    per-feature modulation). CondBN alone conditions weakly early in
    training because its gain/bias tables start at identity."""

    image_size: int = 32
    n_labels: int = 10
    dim: int = 128
    out_channels: int = 3
    label_embed_dim: int = 32
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32
    # Per-stage width multipliers (x dim): entry 0 = the 4x4 input stage,
    # entries 1..n_up = each up-block's output width. None = constant
    # width (parameter tree identical to pre-round-4 checkpoints). The
    # staged-width form (e.g. (8,4,2,1) at 64px) is the classic 64px
    # WGAN-GP geometry: capacity concentrated at low resolution.
    width_mults: Optional[tuple] = None
    # Normalize condition vectors to unit sum (multi-hot: magnitude of the
    # CondBN gain/bias and the label embedding no longer scales with the
    # number of active concepts; one-hot: identity).
    cond_label_norm: bool = False

    @nn.compact
    def __call__(
        self, z: jnp.ndarray, labels: jnp.ndarray, train: bool = True
    ) -> jnp.ndarray:
        n_up = int(math.log2(self.image_size // 4))
        mults = self.width_mults or (1,) * (n_up + 1)
        assert len(mults) == n_up + 1, (
            f"width_mults needs {n_up + 1} entries at {self.image_size}px, "
            f"got {len(mults)}"
        )
        if self.cond_label_norm:
            labels = labels.astype(jnp.float32)
            labels = labels / jnp.maximum(
                labels.sum(axis=-1, keepdims=True), 1.0
            )
        if self.label_embed_dim:
            emb = nn.Dense(self.label_embed_dim, name="label_embed")(
                labels.astype(jnp.float32)
            )
            z = jnp.concatenate([z, emb], axis=-1)
        x = nn.Dense(4 * 4 * self.dim * mults[0], dtype=self.dtype, name="input")(z)
        x = x.reshape(-1, 4, 4, self.dim * mults[0])
        for i in range(n_up):
            x = GenResBlock(
                self.dim * mults[i + 1], self.n_labels,
                axis_name=self.axis_name, dtype=self.dtype, name=f"block{i}",
            )(x, labels, train=train)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9,
            axis_name=self.axis_name, dtype=self.dtype, name="out_bn",
        )(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="out_conv")(x)
        return jnp.tanh(x.astype(jnp.float32))


class DiscResBlock(nn.Module):
    """Critic residual block; optional mean-pool downsample, optional LayerNorm."""

    features: int
    down: bool = False
    use_layernorm: bool = False
    first: bool = False   # "optimized" input block: conv before any activation
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        def maybe_norm(h):
            if self.use_layernorm:
                h = nn.LayerNorm(dtype=self.dtype)(h)
            return h

        if self.first:
            h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv1")(x)
            h = nn.relu(h)
            h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv2")(h)
            h = _meanpool2x(h)
            skip = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="skip")(
                _meanpool2x(x)
            )
            return h + skip

        h = maybe_norm(x)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv1")(h)
        h = maybe_norm(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv2")(h)
        skip = x
        if self.down:
            h = _meanpool2x(h)
            skip = _meanpool2x(skip)
        if skip.shape[-1] != self.features:
            skip = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="skip")(skip)
        return h + skip


class Discriminator(nn.Module):
    """image -> (critic score (N,), aux class logits (N, n_labels)).

    The aux head ties G's conditioning to labels (pair-conditional/ACGAN
    loss, SURVEY.md C11).
    """

    image_size: int = 32
    n_labels: int = 10
    dim: int = 128
    use_layernorm: bool = False
    dtype: Dtype = jnp.float32
    # Per-block width multipliers (x dim), one per res-block in call order
    # (block_in, extra..., block_down, block_a, block_b). None = constant
    # width (pre-round-4 parameter tree). Mirror of Generator.width_mults:
    # widths grow as resolution shrinks.
    width_mults: Optional[tuple] = None
    # Projection conditioning (Miyato & Koyama, "cGANs with projection
    # discriminator"): score(x, y) = critic(phi(x)) + <V y, phi(x)>.
    # The label-dependent inner product gives the critic a per-class score
    # direction whose gradient reaches G directly through the adversarial
    # term — the standard fix when an ACGAN-style aux CE fails to condition
    # at large class counts (measured on config3_cal: aux-only conditioning
    # stays at chance for 14k cycles, docs/BENCHMARKS.md phase-4 sweep).
    # Multi-hot labels sum their class embeddings. projection=False leaves
    # the parameter tree bit-identical to pre-round-4 checkpoints.
    projection: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, labels: Optional[jnp.ndarray] = None):
        n_down_extra = int(math.log2(self.image_size // 32))  # 0 @32, 1 @64
        n_blocks = 4 + n_down_extra
        mults = self.width_mults or (1,) * n_blocks
        assert len(mults) == n_blocks, (
            f"width_mults needs {n_blocks} entries at {self.image_size}px, "
            f"got {len(mults)}"
        )
        h = x.astype(self.dtype)
        h = DiscResBlock(
            self.dim * mults[0], first=True, dtype=self.dtype, name="block_in"
        )(h)
        for i in range(n_down_extra):
            h = DiscResBlock(
                self.dim * mults[1 + i], down=True,
                use_layernorm=self.use_layernorm,
                dtype=self.dtype, name=f"block_extra{i}",
            )(h)
        h = DiscResBlock(
            self.dim * mults[1 + n_down_extra], down=True,
            use_layernorm=self.use_layernorm,
            dtype=self.dtype, name="block_down",
        )(h)
        h = DiscResBlock(
            self.dim * mults[2 + n_down_extra],
            use_layernorm=self.use_layernorm, dtype=self.dtype,
            name="block_a",
        )(h)
        h = DiscResBlock(
            self.dim * mults[3 + n_down_extra],
            use_layernorm=self.use_layernorm, dtype=self.dtype,
            name="block_b",
        )(h)
        h = nn.relu(h)
        h = h.mean(axis=(1, 2)).astype(jnp.float32)  # global mean-pool
        score = nn.Dense(1, name="critic")(h)[:, 0]
        aux = nn.Dense(self.n_labels, name="aux")(h)
        if self.projection and labels is not None:
            # Without labels (e.g. the sample-quality aux-classifier probe)
            # the unconditional part of the decomposed score stands alone.
            v = nn.Dense(h.shape[-1], use_bias=False, name="proj_embed")(
                labels.astype(jnp.float32)
            )
            score = score + jnp.sum(v * h, axis=-1)
        return score, aux
