"""Device mesh + sharding helpers.

Reference parity (SURVEY.md C23/C24): the reference is single-process with,
at most, manual in-graph multi-GPU towers. The rebuild's distributed story
is a 1-D ICI mesh (axis ``data``): batches are sharded along it, params are
replicated, and XLA's partitioner (jit over a Mesh) derives the gradient
psum — the idiomatic replacement for NCCL all-reduce. The gallery scan
shards the *database* axis over the same mesh (SURVEY.md §5 long-context
analog) in parallel/sharded_scan.py.

This module is the single home for topology; everything else takes a Mesh.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = 0, axis: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` (0 = all available)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]), (axis,))


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard leading (batch) dim over the mesh; other dims replicated."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, tree: Any, axis: str = "data") -> Any:
    """device_put a pytree of batch arrays with leading-dim sharding."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x), axis)), tree
    )


def replicate(mesh: Mesh, tree: Any) -> Any:
    """device_put a pytree fully replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
