"""Encoder (stage-II) training step and encode function.

Reference parity (SURVEY.md §3.2): each step trains F with the WML pairwise
loss over a batch of real images, optionally augmented with G-synthesized
images that inherit the conditioning labels. The reference crosses the
host/device boundary twice per step (feed_dict + separate fake-generation
session run); here the whole step — fake synthesis, preprocessing,
augmentation, forward, loss, Adam update — is ONE jitted, device-resident
function. uint8 batches are the only host->device traffic.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from hashgan_tpu.configs import Config
from hashgan_tpu.data.preprocess import (
    alexnet_eval_geometry,
    alexnet_train_geometry,
    gan_to_encoder_input,
    random_crop,
    random_flip,
    to_encoder_input,
)
from hashgan_tpu.losses.pairwise import wml_pairwise_loss
from hashgan_tpu.train.state import EncoderState, make_encoder_tx


def make_encoder_train_step(
    encoder,
    cfg: Config,
    generator=None,
) -> Callable:
    """Returns jitted ``step(state, images_u8, labels, rng, gan_state) ->
    (state, metrics)``. ``gan_state`` may be None when cfg.use_gan is False.
    """
    tx = make_encoder_tx(cfg.encoder)
    hl = cfg.hash_loss
    # train.use_gan_samples gates stage-II fake augmentation independently of
    # use_gan (so a yaml `train: {use_gan_samples: false}` really disables it).
    use_gan = (
        cfg.use_gan and cfg.train.use_gan_samples and generator is not None
    )
    z_dim = cfg.gan.z_dim

    def step(
        state: EncoderState,
        images_u8: jnp.ndarray,
        labels: jnp.ndarray,
        rng: jax.Array,
        g_params=None,
        g_stats=None,
    ) -> Tuple[EncoderState, dict]:
        rng = jax.random.fold_in(rng, state.step)
        r_flip, r_crop, r_drop, r_z = jax.random.split(rng, 4)
        x = to_encoder_input(images_u8)
        x = random_flip(r_flip, x)
        if cfg.train.crop_pad > 0:
            # Reference aug set (SURVEY.md §3.5): crop in addition to flip.
            x = random_crop(r_crop, x, pad=cfg.train.crop_pad)

        if use_gan:
            # Synthesize a half-batch conditioned on (a copy of) the real
            # labels; fakes inherit those labels (SURVEY.md §3.2).
            n_fake = max(1, int(images_u8.shape[0] * cfg.train.fake_ratio))
            z = jax.random.normal(r_z, (n_fake, z_dim))
            fake_labels = labels[:n_fake]
            fake_img = generator.apply(
                {"params": g_params, "batch_stats": g_stats},
                z, fake_labels, train=False,
            )
            fake_x = gan_to_encoder_input(jax.lax.stop_gradient(fake_img))
            x = jnp.concatenate([x, fake_x], axis=0)
            all_labels = jnp.concatenate([labels, fake_labels], axis=0)
            if cfg.train.fake_pair_weight != 1.0:
                sample_weight = jnp.concatenate([
                    jnp.ones((images_u8.shape[0],), jnp.float32),
                    jnp.full((n_fake,), cfg.train.fake_pair_weight,
                             jnp.float32),
                ])
            else:
                sample_weight = None
        else:
            all_labels = labels
            sample_weight = None

        if cfg.encoder.input_resize > 0:
            # Reference AlexNet protocol (resize 256 -> random crop 227):
            # applied to the real-union-fake batch so the conv stack sees one
            # static size for both sources.
            r_geo = jax.random.fold_in(r_crop, 1)
            x = alexnet_train_geometry(
                r_geo, x, cfg.encoder.input_resize, cfg.encoder.resize_base
            )

        def loss_fn(params):
            codes = encoder.apply(
                {"params": params}, x, train=True, rngs={"dropout": r_drop}
            )
            return wml_pairwise_loss(
                codes,
                all_labels,
                alpha=hl.alpha,
                similarity=hl.similarity,
                class_balance=hl.class_balance,
                class_balance_cap=hl.class_balance_cap,
                class_balance_mode=hl.class_balance_mode,
                quantization_weight=hl.quantization_weight,
                balance_weight=hl.balance_weight,
                sample_weight=sample_weight,
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = EncoderState(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


def make_encode_fn(encoder, cfg: Config | None = None) -> Callable:
    """Jitted ``encode(params, images_u8) -> (B, bits) f32 codes`` (eval mode).

    With ``cfg.encoder.input_resize`` set, applies the reference eval-time
    geometry (resize to base, center crop) before the forward pass."""
    input_resize = cfg.encoder.input_resize if cfg is not None else 0
    resize_base = cfg.encoder.resize_base if cfg is not None else 0

    def encode(params, images_u8):
        x = to_encoder_input(images_u8)
        if input_resize > 0:
            x = alexnet_eval_geometry(x, input_resize, resize_base)
        return encoder.apply({"params": params}, x, train=False)

    return jax.jit(encode)


def encode_dataset(
    encode_fn: Callable,
    params,
    dataset,
    batch_size: int = 256,
    mesh=None,
) -> "np.ndarray":
    """Encode a full split with static batch shapes (padded final batch).

    Under a mesh, batches are sharded on the batch axis so XLA partitions
    the encoder forward across devices. Note: partitioned matmuls may sum
    in a different order, so codes agree with single-device encoding only
    to f32 rounding (NOT bit-exact) — Experiment therefore shards encoding
    only for large splits, where the 1/n_devices wall-clock matters.
    ``batch_size`` is rounded up to a mesh multiple."""
    import numpy as np

    from hashgan_tpu.data.pipeline import epoch_batches

    sharding = None
    if mesh is not None and mesh.size > 1:
        import jax as _jax

        from hashgan_tpu.parallel import data_sharding

        batch_size = ((batch_size + mesh.size - 1) // mesh.size) * mesh.size
        sharding = data_sharding(mesh, 4)

    out = []
    for imgs, _labs, mask in epoch_batches(dataset, batch_size):
        batch = imgs
        if sharding is not None:
            batch = _jax.device_put(batch, sharding)
        codes = np.asarray(encode_fn(params, batch))
        out.append(codes[mask])
    return np.concatenate(out, axis=0)
