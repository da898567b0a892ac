"""Train states and optimizers.

Reference parity (SURVEY.md C13): Adam(lr=2e-4, b1=0, b2=0.9) with linear lr
decay for G/D; the encoder trains at a smaller lr with a 10x multiplier on
the (re-initialized) hash layer. The reference's ``params_with_name``
var-list selection becomes explicit Flax param trees; the 10x hash-layer lr
is an ``optax.masked`` update scale applied *after* Adam (pre-Adam gradient
scaling would be erased by Adam's normalization).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from hashgan_tpu.configs import EncoderConfig, GanConfig


class EncoderState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class GanState(struct.PyTreeNode):
    g_params: Any
    g_stats: Any           # generator BatchNorm running stats
    g_opt: Any
    d_params: Any
    d_opt: Any
    step: jnp.ndarray
    g_ema: Any = None        # EMA of g_params (sampling weights) when enabled
    g_ema_stats: Any = None  # EMA of g_stats — sampling pairs weights+stats


def _subtree_mask(params: Dict, predicate: Callable[[str], bool]) -> Dict:
    """Bool mask pytree: True for every leaf under a top-level key matching
    ``predicate`` (e.g. the 'hash' head)."""
    return {
        k: jax.tree_util.tree_map(lambda _: predicate(k), v)
        for k, v in params.items()
    }


def make_gan_tx(
    cfg: GanConfig, updates_per_iter: int = 1
) -> optax.GradientTransformation:
    """Adam with linear lr decay over the run.

    optax schedules count OPTIMIZER UPDATES, but the reference decays lr per
    generator iteration — and the critic takes n_critic updates per
    iteration. ``updates_per_iter`` stretches the horizon accordingly
    (without it the critic's lr hits zero at iters/n_critic and the
    generator then trains against a frozen critic — observed as the
    Wasserstein estimate flipping sign).
    """
    if cfg.decay_lr:
        lr = optax.linear_schedule(cfg.lr, 0.0, cfg.iters * updates_per_iter)
    else:
        lr = cfg.lr
    return optax.adam(lr, b1=cfg.beta1, b2=cfg.beta2)


def make_encoder_tx(cfg: EncoderConfig) -> optax.GradientTransformation:
    lr = (
        optax.linear_schedule(cfg.lr, 0.0, cfg.iters)
        if cfg.decay_lr else cfg.lr
    )
    base = optax.adam(lr)
    if cfg.hash_lr_multiplier == 1.0:
        return base
    return optax.chain(
        base,
        optax.masked(
            optax.scale(cfg.hash_lr_multiplier),
            lambda params: _subtree_mask(params, lambda k: k == "hash"),
        ),
    )


def create_encoder_state(
    rng: jax.Array,
    encoder,
    cfg: EncoderConfig,
    image_shape,
) -> EncoderState:
    dummy = jnp.zeros((2,) + tuple(image_shape), jnp.float32)
    variables = encoder.init({"params": rng, "dropout": rng}, dummy, train=False)
    params = variables["params"]
    if cfg.pretrained_npy:
        from hashgan_tpu.models.alexnet import load_bvlc_weights

        params = load_bvlc_weights(params, cfg.pretrained_npy)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    tx = make_encoder_tx(cfg)
    return EncoderState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )


def create_gan_state(
    rng: jax.Array,
    generator,
    discriminator,
    cfg: GanConfig,
    image_shape,
    n_labels: int,
) -> GanState:
    rg, rd = jax.random.split(rng)
    z = jnp.zeros((2, cfg.z_dim), jnp.float32)
    y = jnp.zeros((2, n_labels), jnp.float32)
    g_vars = generator.init(rg, z, y, train=True)
    x = jnp.zeros((2,) + tuple(image_shape), jnp.float32)
    # Labels at init so a projection critic (d_projection) creates its
    # embedding table; without projection the extra arg leaves the
    # parameter tree untouched.
    d_vars = discriminator.init(rd, x, y)
    g_tx, d_tx = make_gan_tx(cfg), make_gan_tx(cfg, updates_per_iter=cfg.n_critic)
    return GanState(
        g_params=g_vars["params"],
        g_stats=g_vars.get("batch_stats", {}),
        g_opt=g_tx.init(g_vars["params"]),
        d_params=d_vars["params"],
        d_opt=d_tx.init(d_vars["params"]),
        step=jnp.zeros((), jnp.int32),
        # distinct buffers (not aliases of g_params): the cycle donates the
        # state, and aliased leaves would be donated twice
        g_ema=(
            jax.tree_util.tree_map(jnp.copy, g_vars["params"])
            if cfg.ema_decay > 0 else None
        ),
        g_ema_stats=(
            jax.tree_util.tree_map(jnp.copy, g_vars.get("batch_stats", {}))
            if cfg.ema_decay > 0 else None
        ),
    )
