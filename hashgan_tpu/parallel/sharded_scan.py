"""Sharded-gallery Hamming top-k (BASELINE config 5).

The system's "long axis" is the gallery (SURVEY.md §5): N packed codes
sharded across the mesh's ``data`` axis. Queries are replicated; each chip
scans its resident gallery shard (Pallas XOR-popcount + local top-k), then
the per-chip (distance, global-index) candidates are all-gathered over ICI
and merged with one more top-k — a ring-attention-shaped pattern with a
Hamming payload. Communication is k candidates per chip per query, not the
gallery.

Exactness: local indices are offset to global before the merge, and the
merge reuses the distance-major/index-minor composite key, so the result is
bit-identical to a single-chip scan (property-tested at mesh sizes 1/2/8 on
the forced-CPU device grid).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from hashgan_tpu.ops.hamming import hamming_scan_topk


def sharded_hamming_topk(
    mesh: Mesh,
    packed_q: jnp.ndarray,
    gallery_t: jnp.ndarray,
    k: int = 100,
    slab: int = 1 << 17,
    axis: str = "data",
    use_pallas: bool | None = None,
    valid_n: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(Q, W) replicated queries x (W, N) gallery sharded on N -> top-k.

    N must be divisible by the mesh size (pad the gallery at build time —
    index/gallery.py does; ``valid_n`` marks the true item count so tail
    padding sorts strictly last). Returns (dists (Q, k), global indices
    (Q, k)), fully replicated.
    """
    n = gallery_t.shape[1]
    n_dev = mesh.shape[axis]
    assert n % n_dev == 0, f"gallery {n} not divisible by mesh size {n_dev}"
    local_n = n // n_dev
    stride = n + 1
    max_d = 32 * packed_q.shape[1]
    assert (max_d + 1) * stride + n < 2**31, "gallery too large for int32 key"
    if valid_n is None:
        valid_n = n

    def local_scan(q, g_local):
        # g_local: (W, local_n) resident shard
        shard_idx = jax.lax.axis_index(axis)
        local_valid = jnp.clip(valid_n - shard_idx * local_n, 0, local_n)
        d, i = hamming_scan_topk(
            q, g_local, k=min(k, local_n), slab=slab, use_pallas=use_pallas,
            valid_n=local_valid,
        )
        i = i + shard_idx * local_n  # local -> global ids
        # Gather k candidates per chip: (n_dev, Q, k) — rides ICI.
        dg = jax.lax.all_gather(d, axis)
        ig = jax.lax.all_gather(i, axis)
        q_n = q.shape[0]
        cat_d = jnp.moveaxis(dg, 0, 1).reshape(q_n, -1)
        cat_i = jnp.moveaxis(ig, 0, 1).reshape(q_n, -1)
        key = cat_d * jnp.int32(stride) + cat_i
        kk = min(k, n)
        _, pos = jax.lax.top_k(-key, kk)
        return (
            jnp.take_along_axis(cat_d, pos, axis=1),
            jnp.take_along_axis(cat_i, pos, axis=1),
        )

    fn = shard_map(
        local_scan,
        mesh=mesh,
        in_specs=(P(None, None), P(None, axis)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return fn(packed_q, gallery_t)
