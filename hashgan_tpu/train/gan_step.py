"""Fused PC-WGAN training cycle: n_critic critic steps + 1 generator step,
all inside ONE jitted function.

Reference parity (SURVEY.md §3.1): the reference runs 6 ``sess.run`` calls
per iteration, each crossing the host<->device feed_dict boundary — its main
performance sin. Here the cycle takes a stacked (n_critic+1)-batch uint8
tensor and runs the critic loop as a ``lax.scan`` (weights threaded through
the carry), then the generator step, without touching the host. The
gradient penalty's grad-of-grad comes from ``jax.grad`` composed inside the
critic loss (losses/wgan_gp.py).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from hashgan_tpu.configs import Config
from hashgan_tpu.data.preprocess import to_gan_range
from hashgan_tpu.losses.wgan_gp import critic_loss_fn, generator_loss_fn
from hashgan_tpu.train.state import GanState, make_gan_tx


def make_gan_cycle(generator, discriminator, cfg: Config) -> Callable:
    """Returns jitted ``cycle(state, images_u8 (n_critic+1, B, H, W, C),
    labels (n_critic+1, B, K), rng) -> (state, metrics)``."""
    gan = cfg.gan
    multi = cfg.data.multi_label
    g_tx, d_tx = make_gan_tx(gan), make_gan_tx(gan, updates_per_iter=gan.n_critic)

    def gen_fake(g_params, g_stats, z, labels):
        # Train-mode BN (batch stats) but discard stat updates during critic
        # steps; running averages advance only in the generator step.
        fake, _ = generator.apply(
            {"params": g_params, "batch_stats": g_stats},
            z, labels, train=True, mutable=["batch_stats"],
        )
        return fake

    def cycle(
        state: GanState,
        images_u8: jnp.ndarray,
        labels: jnp.ndarray,
        rng: jax.Array,
    ) -> Tuple[GanState, dict]:
        rng = jax.random.fold_in(rng, state.step)
        b = images_u8.shape[1]

        def critic_body(carry, inp):
            d_params, d_opt, k = carry
            imgs, labs = inp
            r = jax.random.fold_in(rng, k)
            rz, rgp = jax.random.split(r)
            real = to_gan_range(imgs)
            z = jax.random.normal(rz, (b, gan.z_dim))
            fake = jax.lax.stop_gradient(
                gen_fake(state.g_params, state.g_stats, z, labs)
            )

            def loss_fn(dp):
                # labels ride the closure: real, fake, and GP interpolates
                # all condition on the SAME labs (fakes are generated with
                # the real batch's labels), so a projection critic sees a
                # consistent y while jax.grad differentiates w.r.t. x only.
                return critic_loss_fn(
                    lambda x: discriminator.apply({"params": dp}, x, labs),
                    rgp, real, fake, labs,
                    gp_lambda=gan.gp_lambda,
                    acgan_scale=gan.acgan_scale,
                    acgan_fake_scale=gan.acgan_fake_scale,
                    multi_label=multi,
                )

            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(d_params)
            updates, d_opt = d_tx.update(grads, d_opt, d_params)
            d_params = optax.apply_updates(d_params, updates)
            return (d_params, d_opt, k + 1), metrics

        (d_params, d_opt, _), d_metrics = jax.lax.scan(
            critic_body,
            (state.d_params, state.d_opt, jnp.zeros((), jnp.int32)),
            (images_u8[: gan.n_critic], labels[: gan.n_critic]),
        )

        # Generator step on the last batch's labels.
        labs_g = labels[gan.n_critic]
        rz = jax.random.fold_in(rng, gan.n_critic)
        z = jax.random.normal(rz, (b, gan.z_dim))

        def g_loss_fn(gp):
            fake, new_vars = generator.apply(
                {"params": gp, "batch_stats": state.g_stats},
                z, labs_g, train=True, mutable=["batch_stats"],
            )
            loss, metrics = generator_loss_fn(
                lambda x: discriminator.apply({"params": d_params}, x, labs_g),
                fake, labs_g,
                acgan_scale_g=gan.acgan_scale_g,
                multi_label=multi,
            )
            return loss, (metrics, new_vars["batch_stats"])

        (_, (g_metrics, g_stats)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g_params)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        g_ema = state.g_ema
        g_ema_stats = state.g_ema_stats
        if gan.ema_decay > 0 and g_ema is not None:
            decay = gan.ema_decay
            ema = lambda e, p: decay * e + (1.0 - decay) * p  # noqa: E731
            g_ema = jax.tree_util.tree_map(ema, g_ema, g_params)
            # BN running stats tracked at the same horizon so EMA sampling
            # normalizes with statistics that match the EMA weights.
            g_ema_stats = jax.tree_util.tree_map(ema, g_ema_stats, g_stats)

        new_state = GanState(
            g_params=g_params, g_stats=g_stats, g_opt=g_opt,
            d_params=d_params, d_opt=d_opt, step=state.step + 1,
            g_ema=g_ema, g_ema_stats=g_ema_stats,
        )
        metrics = {k: v[-1] for k, v in d_metrics.items()}
        metrics.update(g_metrics)
        if gan.d_projection:
            # Projection-free W readout: with d_projection the critic score
            # includes <V y, phi(x)>, so `wasserstein` above ranks a
            # DIFFERENT functional than non-projection recipes (VERDICT r4).
            # Score the generator-step batch with labels=None (projection
            # term statically absent, same params) for a cross-recipe-
            # comparable base-critic estimate. One extra G fwd + two D fwds
            # per cycle, metrics-only (stop_gradient).
            fake_m = jax.lax.stop_gradient(
                gen_fake(g_params, g_stats, z, labs_g)
            )
            base_real, _ = discriminator.apply(
                {"params": d_params}, to_gan_range(images_u8[gan.n_critic]),
                None,
            )
            base_fake, _ = discriminator.apply(
                {"params": d_params}, fake_m, None
            )
            metrics["wasserstein_noproj"] = (
                base_real.mean() - base_fake.mean()
            )
        return new_state, metrics

    return jax.jit(cycle, donate_argnums=(0,))


def make_sample_fn(generator, cfg: Config) -> Callable:
    """Jitted ``sample(g_params, g_stats, z, labels) -> [-1,1] images``
    using running BN averages (eval mode) — for image grids (SURVEY.md C18)."""

    def sample(g_params, g_stats, z, labels):
        return generator.apply(
            {"params": g_params, "batch_stats": g_stats}, z, labels, train=False
        )

    return jax.jit(sample)
