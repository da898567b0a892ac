"""Weighted-maximum-likelihood pairwise hash loss + quantization term.

Reference parity (SURVEY.md C12, §3.2): similarity S_ij = 1[y_i . y_j > 0]
over all in-batch pairs; a pairwise logistic (negative log-likelihood) loss
on a scaled similarity of the continuous codes; WML class-balance weights
w_ij = |S| / |S_1| for similar pairs and |S| / |S_0| for dissimilar pairs
(computed per batch, the reference computes them from the training split);
plus a quantization term pushing code units toward +-1.

Math: with theta_ij = alpha * cos(h_i, h_j) (or alpha/b * <h_i, h_j>),
  P(s_ij | h) = sigmoid(theta)^s * (1 - sigmoid(theta))^(1-s)
  L = - sum_ij w_ij [ s_ij * theta_ij - log(1 + exp(theta_ij)) ] / #pairs
  L_quant = mean((1 - |h|)^2)
All shapes are static; the diagonal (i == i) pairs are masked out.
"""

from __future__ import annotations

import jax.numpy as jnp


def pairwise_similarity(labels_a: jnp.ndarray, labels_b: jnp.ndarray) -> jnp.ndarray:
    """0/1 label matrices -> float {0,1} similarity (share >= 1 class)."""
    return ((labels_a @ labels_b.T) > 0).astype(jnp.float32)


def wml_pairwise_loss(
    codes: jnp.ndarray,
    labels: jnp.ndarray,
    alpha: float = 10.0,
    similarity: str = "cosine",
    class_balance: bool = True,
    class_balance_cap: float = 25.0,
    quantization_weight: float = 0.01,
    balance_weight: float = 0.0,
    codes_b: jnp.ndarray | None = None,
    labels_b: jnp.ndarray | None = None,
    sample_weight: jnp.ndarray | None = None,
    class_balance_mode: str = "count",
):
    """WML pairwise loss over all pairs of (codes, codes_b).

    When codes_b is None the loss runs over all in-batch pairs (minus the
    diagonal). Passing a second set supports real-vs-fake pair training
    (stage II trains F on real ∪ synthetic; cross-pairs carry supervision
    from G's conditioning labels).

    ``sample_weight`` (shape (len(codes),), optional) scales each pair by
    w_i * w_j before the weighted mean — the stage-II fake-pair discount
    (TPU-rebuild extension; the reference weighs real and synthetic pairs
    uniformly, which is the default here). With per-sample weights in
    {1, f}, real-real pairs keep weight 1, real-fake pairs get f and
    fake-fake pairs f^2.

    ``class_balance_mode`` controls how the discount interacts with the
    WML pos/neg rebalancing:

    * ``"count"`` (default, bit-exact with every pre-round-5 run): n_pos /
      n_neg come from the raw pair mask, IGNORING sample weights. On a
      scarce one-hot task — where nearly all positive pairs involve a fake
      (real-real positives are ~1/n_classes of real pairs) — a sub-unit
      fake_pair_weight then halves the effective positive mass while w_pos
      still assumes the undiscounted ratio, silently under-pulling
      positives (measured round 5: config2_cal scarce1000 fpw05 collapsed
      to MAP 0.350 vs 0.577 plain-cotrain).
    * ``"mass"``: n_pos / n_neg are the discount-WEIGHTED pair masses, so
      rebalancing is orthogonal to the discount. With weight 0 on fakes
      this reproduces the real-only pair likelihood exactly even under
      class_balance=True (in "count" mode that identity only holds for
      class_balance=False).
    """
    if codes_b is None:
        codes_b, labels_b = codes, labels
        mask = 1.0 - jnp.eye(codes.shape[0], dtype=jnp.float32)
    else:
        mask = jnp.ones((codes.shape[0], codes_b.shape[0]), dtype=jnp.float32)

    s = pairwise_similarity(labels, labels_b)
    if similarity == "cosine":
        na = codes / (jnp.linalg.norm(codes, axis=1, keepdims=True) + 1e-8)
        nb = codes_b / (jnp.linalg.norm(codes_b, axis=1, keepdims=True) + 1e-8)
        theta = alpha * (na @ nb.T)
    elif similarity == "inner_product":
        theta = (alpha / codes.shape[1]) * (codes @ codes_b.T)
    else:
        raise ValueError(f"unknown similarity {similarity!r}")

    # log(1 + e^theta) - s*theta, numerically stable via softplus
    nll = jnp.logaddexp(0.0, theta) - s * theta

    if class_balance_mode not in ("count", "mass"):
        raise ValueError(f"unknown class_balance_mode {class_balance_mode!r}")
    swo = None
    if sample_weight is not None:
        # Row weights apply to BOTH sides of the in-batch pair matrix (the
        # codes_b=None case); for explicit cross-pairs only the query side
        # carries weights (codes_b rows are the fakes by convention).
        sw = sample_weight.astype(jnp.float32)
        swo = sw[:, None] * sw[None, :] if codes_b is codes else sw[:, None]

    if class_balance:
        base = mask if (swo is None or class_balance_mode == "count") \
            else mask * swo
        n_pos = (s * base).sum()
        n_all = base.sum()
        n_neg = n_all - n_pos
        w_pos = jnp.where(n_pos > 0, n_all / jnp.maximum(n_pos, 1.0), 0.0)
        w_neg = jnp.where(n_neg > 0, n_all / jnp.maximum(n_neg, 1.0), 0.0)
        # Cap: with many classes w_pos ~ n_classes, which overwhelms every
        # other term and drives the codes into exact tanh saturation (zero
        # gradient, frozen training). Clipping keeps the rebalancing while
        # bounding the pull-together force.
        w_pos = jnp.minimum(w_pos, class_balance_cap)
        w_neg = jnp.minimum(w_neg, class_balance_cap)
        w = jnp.where(s > 0, w_pos, w_neg) * mask
    else:
        w = mask
    if swo is not None:
        w = w * swo

    pair_loss = (w * nll).sum() / jnp.maximum(w.sum(), 1.0)
    quant = jnp.mean(jnp.square(1.0 - jnp.abs(codes)))
    # Bit-balance regularizer: push each bit's batch mean toward 0. This
    # removes the "all codes identical" attractor the raw WML loss has
    # (a collapsed batch scores pair_nll = (softplus(a) + softplus(a) - a)/2
    # and is a local optimum once tanh saturates) and doubles as the usual
    # max-entropy/bit-utilization prior of the deep-hashing literature.
    balance = jnp.mean(jnp.square(jnp.mean(codes, axis=0)))
    loss = pair_loss + quantization_weight * quant + balance_weight * balance
    return loss, {
        "hash_loss": loss,
        "pair_nll": pair_loss,
        "quantization": quant,
        "bit_balance_sq": balance,
        "code_abs_mean": jnp.mean(jnp.abs(codes)),
        "bit_balance": jnp.mean(jnp.sign(codes)),
    }
