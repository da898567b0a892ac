import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hashgan_tpu.losses.pairwise import pairwise_similarity, wml_pairwise_loss
from hashgan_tpu.losses.wgan_gp import (
    aux_classification_loss,
    gradient_penalty,
)


def test_gradient_penalty_linear_critic_closed_form():
    """For D(x) = <w, x>, grad_x D = w everywhere, so GP = (||w|| - 1)^2."""
    rng = np.random.default_rng(0)
    w = rng.standard_normal((4, 4, 3)).astype(np.float32)
    wn = np.linalg.norm(w)

    def critic(x):
        return (x * jnp.asarray(w)).sum(axis=(1, 2, 3))

    real = jnp.asarray(rng.standard_normal((8, 4, 4, 3)), dtype=jnp.float32)
    fake = jnp.asarray(rng.standard_normal((8, 4, 4, 3)), dtype=jnp.float32)
    gp = float(gradient_penalty(critic, jax.random.key(0), real, fake))
    assert abs(gp - (wn - 1.0) ** 2) < 1e-4


def test_aux_ce_one_hot_matches_manual():
    logits = jnp.asarray([[2.0, 1.0, 0.0], [0.0, 0.0, 0.0]])
    labels = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    got = float(aux_classification_loss(logits, labels, multi_label=False))
    p0 = np.exp(2.0) / (np.exp(2.0) + np.exp(1.0) + 1.0)
    expect = (-np.log(p0) - np.log(1.0 / 3.0)) / 2.0
    assert abs(got - expect) < 1e-4


def test_aux_bce_multilabel_matches_manual():
    logits = jnp.asarray([[0.5, -0.5]])
    labels = jnp.asarray([[1.0, 0.0]])
    got = float(aux_classification_loss(logits, labels, multi_label=True))
    expect = -np.log(1 / (1 + np.exp(-0.5))) - np.log(1 - 1 / (1 + np.exp(0.5)))
    assert abs(got - expect) < 1e-4


def test_pairwise_similarity_multilabel():
    a = jnp.asarray([[1.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    b = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 0.0, 1.0], [1.0, 0.0, 1.0]])
    s = np.asarray(pairwise_similarity(a, b))
    np.testing.assert_array_equal(s, [[1, 0, 1], [0, 1, 1]])


def test_wml_loss_closed_form_2x2():
    """Hand-check on 2 codes, inner-product similarity, no balance/quant."""
    codes = jnp.asarray([[1.0, -1.0], [1.0, 1.0]])
    labels = jnp.asarray([[1.0, 0.0], [1.0, 0.0]])  # similar pair
    alpha = 2.0
    loss, metrics = wml_pairwise_loss(
        codes, labels, alpha=alpha, similarity="inner_product",
        class_balance=False, quantization_weight=0.0,
    )
    # theta_01 = theta_10 = (2/2) * <h0,h1> = (1*1 + -1*1) = 0
    # nll = log(1+e^0) - 1*0 = log 2 for both off-diagonal pairs
    assert abs(float(loss) - np.log(2.0)) < 1e-6


def test_wml_quantization_term():
    codes = jnp.asarray([[0.5, -0.5]])
    labels = jnp.asarray([[1.0]])
    # single sample: no pairs (diagonal masked) -> pair loss 0; quant = (1-0.5)^2
    loss, metrics = wml_pairwise_loss(
        codes, labels, class_balance=False, quantization_weight=1.0
    )
    assert abs(float(metrics["quantization"]) - 0.25) < 1e-6
    assert abs(float(loss) - 0.25) < 1e-6


def test_wml_class_balance_upweights_rare_pairs():
    """With 1 similar and 3 dissimilar pairs, weights are |S|/|S1|=4 and
    |S|/|S0|=4/3; check the weighted mean against a manual computation."""
    codes = jnp.asarray([[1.0, 1.0], [1.0, 1.0], [-1.0, -1.0], [-1.0, 1.0]])
    labels = jnp.asarray([[1, 0], [1, 0], [0, 1], [0, 0]], dtype=jnp.float32)
    loss, _ = wml_pairwise_loss(
        codes, labels, alpha=1.0, similarity="inner_product",
        class_balance=True, quantization_weight=0.0,
    )
    c = np.asarray(codes)
    lab = np.asarray(labels)
    s = (lab @ lab.T > 0).astype(float)
    theta = (1.0 / 2) * (c @ c.T)
    nll = np.logaddexp(0.0, theta) - s * theta
    mask = 1.0 - np.eye(4)
    n_all, n_pos = mask.sum(), (s * mask).sum()
    w = np.where(s > 0, n_all / n_pos, n_all / (n_all - n_pos)) * mask
    expect = (w * nll).sum() / w.sum()
    assert abs(float(loss) - expect) < 1e-5


def test_wml_cross_set_pairs():
    """codes_b path (real vs fake) uses the full rectangular pair grid."""
    rng = np.random.default_rng(1)
    ca = jnp.asarray(rng.standard_normal((5, 8)), dtype=jnp.float32)
    cb = jnp.asarray(rng.standard_normal((3, 8)), dtype=jnp.float32)
    la = jnp.asarray(np.eye(2)[rng.integers(0, 2, 5)], dtype=jnp.float32)
    lb = jnp.asarray(np.eye(2)[rng.integers(0, 2, 3)], dtype=jnp.float32)
    loss, _ = wml_pairwise_loss(ca, la, codes_b=cb, labels_b=lb)
    assert np.isfinite(float(loss))


def test_wml_sample_weight_identity_and_realonly_limit():
    """fake_pair_weight semantics: weight 1 == unweighted (bit-identical
    values); weight 0 on the fake rows reproduces the real-only pair NLL
    exactly (class_balance=False: the weighted-mean normalizer is the
    weighted pair count)."""
    rng = np.random.default_rng(7)
    real = jnp.asarray(rng.standard_normal((6, 8)), dtype=jnp.float32)
    fake = jnp.asarray(rng.standard_normal((3, 8)), dtype=jnp.float32)
    lr = jnp.asarray(np.eye(3)[rng.integers(0, 3, 6)], dtype=jnp.float32)
    lf = jnp.asarray(np.eye(3)[rng.integers(0, 3, 3)], dtype=jnp.float32)
    codes = jnp.concatenate([real, fake])
    labels = jnp.concatenate([lr, lf])
    kw = dict(alpha=3.0, similarity="inner_product", class_balance=False,
              quantization_weight=0.0)

    base, m_base = wml_pairwise_loss(codes, labels, **kw)
    ones, m_ones = wml_pairwise_loss(
        codes, labels, sample_weight=jnp.ones(9), **kw)
    assert float(base) == float(ones)

    sw = jnp.concatenate([jnp.ones(6), jnp.zeros(3)])
    _, m_zero = wml_pairwise_loss(codes, labels, sample_weight=sw, **kw)
    _, m_real = wml_pairwise_loss(real, lr, **kw)
    np.testing.assert_allclose(float(m_zero["pair_nll"]),
                               float(m_real["pair_nll"]), rtol=1e-6)

    # intermediate weight: pair matrix scaling real-real 1, real-fake f,
    # fake-fake f^2 — check against a manual computation.
    f = 0.25
    swf = jnp.concatenate([jnp.ones(6), jnp.full((3,), f)])
    _, m_f = wml_pairwise_loss(codes, labels, sample_weight=swf, **kw)
    c = np.asarray(codes)
    lab = np.asarray(labels)
    s = (lab @ lab.T > 0).astype(float)
    theta = (3.0 / 8) * (c @ c.T)
    nll = np.logaddexp(0.0, theta) - s * theta
    mask = 1.0 - np.eye(9)
    wvec = np.concatenate([np.ones(6), np.full(3, f)])
    w = mask * np.outer(wvec, wvec)
    expect = (w * nll).sum() / w.sum()
    assert abs(float(m_f["pair_nll"]) - expect) < 1e-5


def test_wml_sample_weight_cross_set():
    """codes_b path: weights apply to the query side rows."""
    rng = np.random.default_rng(3)
    ca = jnp.asarray(rng.standard_normal((4, 8)), dtype=jnp.float32)
    cb = jnp.asarray(rng.standard_normal((3, 8)), dtype=jnp.float32)
    la = jnp.asarray(np.eye(2)[rng.integers(0, 2, 4)], dtype=jnp.float32)
    lb = jnp.asarray(np.eye(2)[rng.integers(0, 2, 3)], dtype=jnp.float32)
    kw = dict(class_balance=False, quantization_weight=0.0)
    sw = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    _, m = wml_pairwise_loss(ca, la, codes_b=cb, labels_b=lb,
                             sample_weight=sw, **kw)
    _, m2 = wml_pairwise_loss(ca[::2], la[::2], codes_b=cb, labels_b=lb, **kw)
    np.testing.assert_allclose(float(m["pair_nll"]),
                               float(m2["pair_nll"]), rtol=1e-6)


def test_wml_class_balance_mode_mass_realonly_limit():
    """round-5 fix: in "mass" mode the f=0 discount reproduces the
    real-only pair NLL even WITH class_balance (in "count" mode the
    balance weights still assume the undiscounted pos/neg ratio, so the
    identity fails — the measured one-hot fpw05 collapse)."""
    rng = np.random.default_rng(11)
    real = jnp.asarray(rng.standard_normal((8, 16)), dtype=jnp.float32)
    fake = jnp.asarray(rng.standard_normal((4, 16)), dtype=jnp.float32)
    lr = jnp.asarray(np.eye(4)[rng.integers(0, 4, 8)], dtype=jnp.float32)
    lf = jnp.asarray(np.eye(4)[rng.integers(0, 4, 4)], dtype=jnp.float32)
    codes = jnp.concatenate([real, fake])
    labels = jnp.concatenate([lr, lf])
    kw = dict(alpha=3.0, similarity="inner_product", class_balance=True,
              class_balance_cap=25.0, quantization_weight=0.0)
    sw = jnp.concatenate([jnp.ones(8), jnp.zeros(4)])

    _, m_mass = wml_pairwise_loss(codes, labels, sample_weight=sw,
                                  class_balance_mode="mass", **kw)
    _, m_real = wml_pairwise_loss(real, lr, **kw)
    np.testing.assert_allclose(float(m_mass["pair_nll"]),
                               float(m_real["pair_nll"]), rtol=1e-6)

    _, m_count = wml_pairwise_loss(codes, labels, sample_weight=sw,
                                   class_balance_mode="count", **kw)
    assert abs(float(m_count["pair_nll"]) - float(m_real["pair_nll"])) > 1e-4


def test_wml_class_balance_mode_default_bitexact():
    """"count" is the default and must stay bit-exact with the historical
    behavior: identical values with no sample_weight in either mode, and
    in count mode the balance weights ignore the discount (checked against
    a manual computation)."""
    rng = np.random.default_rng(13)
    codes = jnp.asarray(rng.standard_normal((9, 8)), dtype=jnp.float32)
    labels = jnp.asarray(np.eye(3)[rng.integers(0, 3, 9)], dtype=jnp.float32)
    kw = dict(alpha=3.0, similarity="inner_product", class_balance=True,
              class_balance_cap=25.0, quantization_weight=0.0)

    base, _ = wml_pairwise_loss(codes, labels, **kw)
    mass, _ = wml_pairwise_loss(codes, labels, class_balance_mode="mass",
                                **kw)
    assert float(base) == float(mass)

    f = 0.5
    sw = np.concatenate([np.ones(6), np.full(3, f)])
    _, m = wml_pairwise_loss(codes, labels,
                             sample_weight=jnp.asarray(sw), **kw)
    c = np.asarray(codes); lab = np.asarray(labels)
    s = (lab @ lab.T > 0).astype(float)
    theta = (3.0 / 8) * (c @ c.T)
    nll = np.logaddexp(0.0, theta) - s * theta
    mask = 1.0 - np.eye(9)
    n_pos = (s * mask).sum(); n_all = mask.sum(); n_neg = n_all - n_pos
    w_pos = min(n_all / max(n_pos, 1.0), 25.0)
    w_neg = min(n_all / max(n_neg, 1.0), 25.0)
    w = np.where(s > 0, w_pos, w_neg) * mask * np.outer(sw, sw)
    expect = (w * nll).sum() / w.sum()
    assert abs(float(m["pair_nll"]) - expect) < 1e-5


def test_wml_class_balance_mode_invalid():
    rng = np.random.default_rng(5)
    codes = jnp.asarray(rng.standard_normal((4, 8)), dtype=jnp.float32)
    labels = jnp.asarray(np.eye(2)[rng.integers(0, 2, 4)], dtype=jnp.float32)
    with pytest.raises(ValueError, match="class_balance_mode"):
        wml_pairwise_loss(codes, labels, class_balance_mode="median")
