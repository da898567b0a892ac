"""GAN sample-quality metrics (SURVEY.md C19 — inception score).

The reference (possibly) computes an Inception Score through a TF inception
graph. This environment has no network, so the classifier is pluggable:
``inception_score_from_logits`` implements the IS math
(exp E_x[KL(p(y|x) || p(y))]) for ANY classifier's logits, and
``sample_quality_report`` defaults to the critic's auxiliary label head —
a self-contained conditional-GAN health check (the aux head is exactly the
classifier PC-WGAN trains). Scores from different classifiers are not
comparable across papers; this is a monitoring metric, not a leaderboard
number.

Because the aux head co-trains with the generator, it trends WITH the thing
being measured. For synthetic data the class templates are known, so
``make_template_classifier`` provides a FROZEN, generator-independent
scorer (negative pixel distance to each class template) — the
``*_tmpl``-suffixed metrics in Experiment.sample_quality come from it.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


def inception_score_from_logits(
    logits: jnp.ndarray, splits: int = 1, eps: float = 1e-12
) -> float:
    """exp(E_x KL(p(y|x) || p(y))), optionally averaged over splits."""
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    n = probs.shape[0]
    scores = []
    for part in np.array_split(probs, splits):
        marginal = part.mean(axis=0, keepdims=True)
        kl = (part * (np.log(part + eps) - np.log(marginal + eps))).sum(axis=1)
        scores.append(float(np.exp(kl.mean())))
    return float(np.mean(scores))


def conditional_accuracy(
    logits: jnp.ndarray, labels: jnp.ndarray, multi_label: bool = False
) -> float:
    """Did the conditional generator hit its target class?

    multi_label: per-sample IoU between the target multi-hot set and the
    top-m scored classes, m = |target set| — threshold-free, so it works
    for ANY monotone score scale (sigmoid aux logits AND the template
    classifier's negative distances; a fixed ``> 0`` cut reads distance
    scores as identically-empty predictions)."""
    logits, labels = np.asarray(logits), np.asarray(labels)
    if multi_label:
        tgt = labels > 0.5
        m = tgt.sum(axis=1)
        # rank[i, c] = position of class c in row i's descending score order
        rank = np.argsort(np.argsort(-logits, axis=1), axis=1)
        pred = rank < m[:, None]
        inter = (pred & tgt).sum(axis=1)
        union = (pred | tgt).sum(axis=1)
        return float(np.mean(inter / np.maximum(union, 1)))
    return float(np.mean(logits.argmax(axis=1) == labels.argmax(axis=1)))


def make_template_classifier(
    templates: "np.ndarray", temperature: float | None = None
) -> Callable:
    """Frozen nearest-template classifier over GAN-range images.

    templates: (K, H, W, C) in [0, 255] (data/synthetic.py class templates).
    Returns ``apply(imgs_in_[-1,1]) -> (B, K) logits`` with
    logit_k = -||x - t_k||^2 / T — independent of anything being trained.
    """
    t = jnp.asarray(templates, jnp.float32) / 127.5 - 1.0
    if temperature is None:
        temperature = float(t[0].size) * 0.05

    @jax.jit
    def apply(imgs: jnp.ndarray) -> jnp.ndarray:
        x = imgs.astype(jnp.float32)
        d2 = ((x[:, None] - t[None]) ** 2).sum(axis=(2, 3, 4))
        return -d2 / temperature

    return apply


def sample_quality_report(
    generator_apply: Callable,
    classifier_apply: Callable,
    rng: jax.Array,
    n_labels: int,
    z_dim: int,
    n_samples: int = 512,
    batch: int = 64,
    multi_label: bool = False,
    key_suffix: str = "",
) -> Dict[str, float]:
    """Sample G across the label grid, score with a classifier (default use:
    the critic's aux head). Returns IS, conditional accuracy, marginal
    entropy (bits of label coverage). ``key_suffix`` distinguishes reports
    from different classifiers (e.g. "_tmpl" for the frozen template
    classifier)."""
    all_logits, all_labels = [], []
    eye = np.eye(n_labels, dtype=np.float32)
    for i in range(0, n_samples, batch):
        r = jax.random.fold_in(rng, i)
        labels = jnp.asarray(eye[np.arange(i, i + batch) % n_labels])
        z = jax.random.normal(r, (batch, z_dim))
        imgs = generator_apply(z, labels)
        logits = classifier_apply(imgs)
        all_logits.append(np.asarray(logits))
        all_labels.append(np.asarray(labels))
    logits = np.concatenate(all_logits)
    labels = np.concatenate(all_labels)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    marginal = probs.mean(axis=0)
    entropy = float(-(marginal * np.log2(marginal + 1e-12)).sum())
    return {
        f"inception_score{key_suffix}": inception_score_from_logits(logits),
        f"conditional_accuracy{key_suffix}": conditional_accuracy(
            logits, labels, multi_label
        ),
        f"marginal_label_entropy_bits{key_suffix}": entropy,
    }
