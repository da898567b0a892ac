"""Round-4 stage-I convergence knobs (configs/config.py GanConfig):

- width_mults on G/D: None must preserve the pre-round-4 parameter tree
  bit-for-bit (checkpoint compatibility); staged widths must produce the
  requested channel progression.
- acgan_fake_scale: aux CE on fakes enters the critic loss and its metric.
- cond_label_norm: identity for one-hot conditions; unit-sum for multi-hot.
- d_layernorm threads from the config into the critic.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hashgan_tpu.losses.wgan_gp import critic_loss_fn
from hashgan_tpu.models import Discriminator, Generator


def _tree_shapes(tree):
    return jax.tree_util.tree_map(lambda x: x.shape, tree)


def test_width_mults_none_matches_ones():
    rng = jax.random.key(0)
    z = jnp.zeros((2, 16))
    y = jnp.eye(4)[:2]
    g_none = Generator(image_size=32, n_labels=4, dim=8)
    g_ones = Generator(image_size=32, n_labels=4, dim=8, width_mults=(1, 1, 1, 1))
    v_none = g_none.init(rng, z, y)
    v_ones = g_ones.init(rng, z, y)
    assert _tree_shapes(v_none) == _tree_shapes(v_ones)
    # same seed + same shapes -> identical params (no new collections)
    chex_equal = jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: bool(jnp.array_equal(a, b)), v_none, v_ones
        )
    )
    assert chex_equal


def test_staged_widths_64px_shapes():
    rng = jax.random.key(1)
    z = jnp.zeros((2, 16))
    y = jnp.zeros((2, 7)).at[:, :2].set(1.0)
    gen = Generator(
        image_size=64, n_labels=7, dim=8, width_mults=(8, 8, 4, 2, 1)
    )
    variables = gen.init(rng, z, y)
    img = gen.apply(variables, z, y, train=False)
    assert img.shape == (2, 64, 64, 3)
    p = variables["params"]
    # input stage: 4*4*dim*8; block outputs follow the multipliers
    assert p["input"]["kernel"].shape[-1] == 4 * 4 * 8 * 8
    assert p["block0"]["conv1"]["kernel"].shape[-1] == 8 * 8
    assert p["block1"]["conv1"]["kernel"].shape[-1] == 8 * 4
    assert p["block2"]["conv1"]["kernel"].shape[-1] == 8 * 2
    assert p["block3"]["conv1"]["kernel"].shape[-1] == 8 * 1

    disc = Discriminator(
        image_size=64, n_labels=7, dim=8, width_mults=(1, 2, 4, 8, 8)
    )
    dv = disc.init(rng, jnp.zeros((2, 64, 64, 3)))
    score, aux = disc.apply(dv, jnp.zeros((2, 64, 64, 3)))
    assert score.shape == (2,) and aux.shape == (2, 7)
    dp = dv["params"]
    assert dp["block_in"]["conv1"]["kernel"].shape[-1] == 8
    assert dp["block_extra0"]["conv1"]["kernel"].shape[-1] == 16
    assert dp["block_down"]["conv1"]["kernel"].shape[-1] == 32
    assert dp["block_a"]["conv1"]["kernel"].shape[-1] == 64
    assert dp["block_b"]["conv1"]["kernel"].shape[-1] == 64


def test_width_mults_length_validation():
    gen = Generator(image_size=32, n_labels=4, dim=8, width_mults=(1, 1))
    with pytest.raises(AssertionError):
        gen.init(jax.random.key(0), jnp.zeros((1, 8)), jnp.eye(4)[:1])


def test_acgan_fake_scale_enters_loss():
    rng = jax.random.key(2)
    disc = Discriminator(image_size=32, n_labels=4, dim=8)
    x = jax.random.normal(rng, (4, 32, 32, 3))
    dv = disc.init(rng, x)
    d_apply = lambda im: disc.apply(dv, im)  # noqa: E731
    real = x
    fake = jax.random.normal(jax.random.key(3), (4, 32, 32, 3))
    labels = jnp.eye(4)
    loss0, m0 = critic_loss_fn(
        d_apply, jax.random.key(4), real, fake, labels, acgan_fake_scale=0.0
    )
    loss1, m1 = critic_loss_fn(
        d_apply, jax.random.key(4), real, fake, labels, acgan_fake_scale=1.0
    )
    assert "d_aux_ce_fake" not in m0
    assert m1["d_aux_ce_fake"] > 0
    np.testing.assert_allclose(
        float(loss1), float(loss0) + float(m1["d_aux_ce_fake"]), rtol=1e-6
    )
    assert float(m1["d_loss"]) == float(loss1)


def test_cond_label_norm_onehot_identity_multihot_scaled():
    rng = jax.random.key(5)
    z = jax.random.normal(rng, (3, 16))
    one_hot = jnp.eye(5)[:3]
    g_raw = Generator(image_size=32, n_labels=5, dim=8)
    g_norm = Generator(image_size=32, n_labels=5, dim=8, cond_label_norm=True)
    variables = g_raw.init(jax.random.key(6), z, one_hot)
    a = g_raw.apply(variables, z, one_hot, train=False)
    b = g_norm.apply(variables, z, one_hot, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # multi-hot: normalized conditioning equals conditioning on y / sum(y)
    multi = jnp.zeros((3, 5)).at[:, :2].set(1.0)
    c = g_norm.apply(variables, z, multi, train=False)
    d = g_raw.apply(variables, z, multi / 2.0, train=False)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))


def test_d_layernorm_threads_from_config():
    from hashgan_tpu.configs import get_config
    from hashgan_tpu.train.loop import Experiment

    cfg = get_config("config3")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, image_size=32, n_train=64, n_query=16, n_database=64
        ),
        gan=dataclasses.replace(
            cfg.gan, dim=8, z_dim=8, d_layernorm=True,
            g_width_mults=(2, 2, 1, 1), d_width_mults=(1, 1, 2, 2),
        ),
        train=dataclasses.replace(cfg.train, batch_size=8, workdir="/tmp/t_knobs"),
    )
    exp = Experiment(cfg, use_mesh=False)
    assert exp.discriminator.use_layernorm
    assert exp.discriminator.width_mults == (1, 1, 2, 2)
    assert exp.generator.width_mults == (2, 2, 1, 1)
    # LayerNorm params actually exist in the critic tree
    d_params = jax.device_get(exp.gan_state.d_params)
    flat = jax.tree_util.tree_flatten_with_path(d_params)[0]
    assert any("LayerNorm" in jax.tree_util.keystr(k) for k, _ in flat)


def test_projection_off_preserves_param_tree():
    """projection=False must leave the critic parameter tree bit-identical
    to the pre-round-4 Discriminator even when labels are passed at init
    (checkpoint compatibility — create_gan_state now always passes y)."""
    rng = jax.random.key(7)
    x = jnp.zeros((2, 32, 32, 3))
    y = jnp.eye(4)[:2]
    v_old = Discriminator(image_size=32, n_labels=4, dim=8).init(rng, x)
    v_new = Discriminator(image_size=32, n_labels=4, dim=8).init(rng, x, y)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: bool(jnp.array_equal(a, b)), v_old, v_new
        )
    )


def test_projection_scores_condition_on_labels():
    rng = jax.random.key(8)
    disc = Discriminator(image_size=32, n_labels=4, dim=8, projection=True)
    x = jax.random.normal(rng, (3, 32, 32, 3))
    y0 = jnp.eye(4)[jnp.array([0, 1, 2])]
    y1 = jnp.eye(4)[jnp.array([3, 3, 3])]
    dv = disc.init(rng, x, y0)
    assert "proj_embed" in dv["params"]
    s0, aux0 = disc.apply(dv, x, y0)
    s1, aux1 = disc.apply(dv, x, y1)
    # projection term makes the score label-dependent; aux head is not
    assert not np.allclose(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(aux0), np.asarray(aux1))
    # score decomposition: apply without labels = unconditional part, and
    # the label term is the proj_embed inner product (multi-hot sums class
    # embeddings: y0+y1 rows == row(y0) + row(y1) - unconditional)
    s_un, _ = disc.apply(dv, x)
    s_both, _ = disc.apply(dv, x, y0 + y1)
    np.testing.assert_allclose(
        np.asarray(s_both - s_un), np.asarray((s0 - s_un) + (s1 - s_un)),
        rtol=1e-4, atol=1e-4,
    )


def test_projection_gan_cycle_runs_and_threads_from_config():
    from hashgan_tpu.configs import get_config
    from hashgan_tpu.train.loop import Experiment

    cfg = get_config("config3")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, image_size=32, n_train=64, n_query=16, n_database=64
        ),
        gan=dataclasses.replace(
            cfg.gan, dim=8, z_dim=8, d_projection=True, iters=2,
            n_critic=2, ema_decay=0.0,
        ),
        train=dataclasses.replace(
            cfg.train, batch_size=8, workdir="/tmp/t_proj",
            log_every=1, sample_every=1 << 30, checkpoint_every=1 << 30,
            eval_every=1 << 30,
        ),
    )
    exp = Experiment(cfg, use_mesh=False)
    assert exp.discriminator.projection
    d_params = jax.device_get(exp.gan_state.d_params)
    assert "proj_embed" in d_params
    metrics = exp.train_gan()
    assert np.isfinite(metrics["wasserstein"])
    assert np.isfinite(metrics["grad_penalty"])
