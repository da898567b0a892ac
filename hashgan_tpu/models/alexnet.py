"""AlexNet hash encoder with optional bvlc_alexnet.npy weight loading.

Reference parity (SURVEY.md C9): the reference builds AlexNet conv1-fc7 from
the Caffe ``bvlc_alexnet.npy`` ImageNet weights and replaces fc8 with a
b-unit tanh hash layer trained at 10x the backbone lr. This is the same
architecture as a Flax module: grouped convs via ``feature_group_count``,
Caffe-style LRN, VALID max-pools (skipped when the map is already 1x1 so the
net also runs on small dev images), dropout on fc6/fc7.

Weight loading maps the classic npy layout {layer: [W, b]} (conv W already
in HWIO); fc layers load only when flatten dims match (i.e. 227x227 inputs),
otherwise they stay randomly initialized — matching the reference's behavior
of always re-initializing the new hash layer.

From-scratch note (driven on the real chip, docs/BENCHMARKS.md): with a
RANDOM backbone the reference's 10x hash-lr multiplier saturates tanh
unrecoverably within ~100 steps; set ``encoder.hash_lr_multiplier: 1`` for
from-scratch runs. The 10x setting is for the bvlc-pretrained protocol —
the only mode the reference ships.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hashgan_tpu.models.encoders import HashHead
from hashgan_tpu.models.layers import local_response_norm

Dtype = Any


def _maxpool(h: jnp.ndarray) -> jnp.ndarray:
    if min(h.shape[1], h.shape[2]) < 3:
        return h
    return nn.max_pool(h, (3, 3), strides=(2, 2), padding="VALID")


class AlexNetEncoder(nn.Module):
    bits: int = 48
    dtype: Dtype = jnp.float32
    dropout_rate: float = 0.5
    # Reference parity: resize inputs to 227x227 before conv1 so fc6/fc7
    # shapes match bvlc_alexnet.npy. 0 disables (dev-scale images run the
    # conv stack at native size with adaptive pools).
    input_resize: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        h = x.astype(self.dtype)  # mean-subtracted pixels (preprocess.py)
        if self.input_resize and h.shape[1] != self.input_resize:
            import jax

            h = jax.image.resize(
                h,
                (h.shape[0], self.input_resize, self.input_resize, h.shape[3]),
                method="bilinear",
            )
        h = nn.Conv(96, (11, 11), strides=(4, 4), padding="VALID",
                    dtype=self.dtype, name="conv1")(h)
        h = nn.relu(h)
        h = local_response_norm(h)
        h = _maxpool(h)
        h = nn.Conv(256, (5, 5), feature_group_count=2, dtype=self.dtype,
                    name="conv2")(h)
        h = nn.relu(h)
        h = local_response_norm(h)
        h = _maxpool(h)
        h = nn.Conv(384, (3, 3), dtype=self.dtype, name="conv3")(h)
        h = nn.relu(h)
        h = nn.Conv(384, (3, 3), feature_group_count=2, dtype=self.dtype,
                    name="conv4")(h)
        h = nn.relu(h)
        h = nn.Conv(256, (3, 3), feature_group_count=2, dtype=self.dtype,
                    name="conv5")(h)
        h = nn.relu(h)
        h = _maxpool(h)
        h = h.reshape(h.shape[0], -1)
        h = nn.Dense(4096, dtype=self.dtype, name="fc6")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = nn.Dense(4096, dtype=self.dtype, name="fc7")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        # Same stabilizer the ResNet backbone needed (models/encoders.py):
        # from RANDOM init the conv stack's activation scale drives the
        # 4096-d hash-head pre-activation deep into tanh saturation (driven
        # on-chip: bit_balance_sq pinned at 1.0, zero grad, frozen loss).
        # The reference never hits this because it always starts from bvlc
        # ImageNet weights; with pretrained weights the norm is benign (a
        # fixed feature renormalization ahead of a learned head).
        h = nn.LayerNorm(dtype=jnp.float32, name="embed_norm")(
            h.astype(jnp.float32)
        )
        return HashHead(self.bits, name="hash")(h)


_NPY_LAYERS = ("conv1", "conv2", "conv3", "conv4", "conv5", "fc6", "fc7")


def load_bvlc_weights(params: Dict, npy_path: str) -> Dict:
    """Copy bvlc_alexnet.npy weights into an AlexNetEncoder param tree.

    Returns a new param tree; layers whose shapes don't match (fc layers at
    non-227 input sizes) are left at their initialized values.
    """
    if not os.path.exists(npy_path):
        raise FileNotFoundError(npy_path)
    blobs = np.load(npy_path, allow_pickle=True, encoding="latin1").item()
    import jax

    params = jax.tree_util.tree_map(np.asarray, params)
    loaded = dict(params)
    for name in _NPY_LAYERS:
        if name not in blobs or name not in loaded:
            continue
        w, b = blobs[name][0], blobs[name][1]
        slot = dict(loaded[name])
        if slot["kernel"].shape == w.shape and slot["bias"].shape == b.shape:
            slot["kernel"] = np.asarray(w, dtype=np.float32)
            slot["bias"] = np.asarray(b, dtype=np.float32)
            loaded[name] = slot
    return loaded
