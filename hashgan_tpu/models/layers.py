"""Shared Flax layers.

Reference parity (SURVEY.md C5-C7): the reference's tflib op layer provides
Batchnorm / cond_batchnorm / Layernorm modules keyed by a global param store.
Here they are ordinary Flax modules; the conditional BatchNorm is the PC-WGAN
generator's conditioning mechanism (per-label gain/bias), generalized to be
linear in the label vector so one module covers one-hot (CIFAR) and
multi-hot (NUS-WIDE) conditioning.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


class CondBatchNorm(nn.Module):
    """BatchNorm whose scale/bias are affine functions of the label vector.

    gamma(y) = 1 + y @ G, beta(y) = y @ B. For one-hot y this is exactly a
    per-class (gain, bias) table — the reference's cond_batchnorm
    (SURVEY.md C6). Statistics are computed over (N, H, W); pass
    ``axis_name`` to psum them across a data-parallel mesh axis.
    """

    n_labels: int
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        norm = nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            use_bias=False,
            use_scale=False,
            axis_name=self.axis_name,
            dtype=x.dtype,
        )(x)
        c = x.shape[-1]
        gamma_table = self.param(
            "gamma", nn.initializers.zeros, (self.n_labels, c), jnp.float32
        )
        beta_table = self.param(
            "beta", nn.initializers.zeros, (self.n_labels, c), jnp.float32
        )
        labels = labels.astype(jnp.float32)
        gamma = 1.0 + labels @ gamma_table  # (N, C)
        beta = labels @ beta_table
        gamma = gamma[:, None, None, :].astype(x.dtype)
        beta = beta[:, None, None, :].astype(x.dtype)
        return norm * gamma + beta


def local_response_norm(
    x: jnp.ndarray,
    radius: int = 2,
    alpha: float = 2e-5,
    beta: float = 0.75,
    bias: float = 1.0,
) -> jnp.ndarray:
    """AlexNet's cross-channel LRN (stateless, jit-friendly).

    Matches Caffe semantics used by bvlc_alexnet: the sum runs over a window
    of ``2*radius+1`` channels and alpha already includes the window-size
    normalization (TF's tf.nn.lrn convention, which the reference uses).
    """
    squared = jnp.square(x)
    window = 2 * radius + 1
    pad = jnp.pad(squared, ((0, 0), (0, 0), (0, 0), (radius, radius)))
    acc = jnp.zeros_like(x)
    for i in range(window):  # static unroll; window is tiny (5)
        acc = acc + pad[..., i : i + x.shape[-1]]
    return x / jnp.power(bias + alpha * acc, beta)
