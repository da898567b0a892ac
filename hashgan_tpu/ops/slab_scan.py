"""Per-slab rebased keys: the MXU engines past the int32 composite ceiling.

The grouped engines encode (distance, global index) in one int32 key, which
caps a single layout at ~16.5M items for 128-bit codes ((bits+1)*stride +
n_total < 2^31). Round 2 degraded larger single-chip galleries to the sort
engine (~130x slower). This module keeps the MXU path exact at ANY size by
REBASING keys per slab: the gallery is cut into contiguous slabs that each
fit the key space, every slab runs the unmodified single-chip engine
(ops/mxu_scan.py / ops/mxu_large_k.py) with slab-LOCAL keys under one
lax.scan (one compile for all slabs), and the per-slab top-k lists merge
with the position key already proven in the sharded merge
(parallel/sharded_scan.py): slabs are contiguous ascending index ranges and
each slab list is (distance asc, index asc), so ``d * n_cand + position``
orders exactly like the global (d, idx) — and that key fits int32 for any
gallery size (d <= 129, n_cand = n_slabs * k).

This is the single-chip sequential twin of the sharded merge: same
contiguity argument, lax.scan over slabs instead of shard_map over chips.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def mxu_slab_capacity(words: int, groups: int = 128,
                      col_multiple: int = 256) -> int:
    """Largest layout-unit multiple of items satisfying the STRICTEST slab
    engine's key bound — mxu_topk_large's (bits+2)*(n+1) + n < 2^31, i.e.
    n < (2^31 - bits - 2)/(bits + 3) (~16.4M at 128 bits, ~61M at 32).
    mxu_topk's (bits+1)-scaled bound is looser and also holds, so a
    default-capacity slab can route to either engine."""
    bits = 32 * words
    unit = groups * col_multiple
    nt_max = (2**31 - bits - 2) // (bits + 3)
    return max(unit, (nt_max // unit) * unit)


def build_slabbed_layout(
    packed: np.ndarray,
    groups: int = 128,
    col_multiple: int = 256,
    slab_items: int | None = None,
):
    """(N, W) canonical packed codes -> stacked per-slab scan layouts.

    Returns (gallery_gs (S, W, L, C), canon_bgs (S, C, L*W), valids (S,)
    int32, slab_items). Slab s owns canonical items
    [s*slab_items, (s+1)*slab_items) — contiguity is what makes the
    position-key merge exact."""
    from hashgan_tpu.ops.groupmin import to_grouped_layout
    from hashgan_tpu.ops.mxu_scan import to_group_major

    n, w = packed.shape
    if slab_items is None:
        slab_items = mxu_slab_capacity(w, groups, col_multiple)
    unit = groups * col_multiple
    assert slab_items % unit == 0, (slab_items, unit)
    s = max(1, -(-n // slab_items))
    total = s * slab_items
    if total != n:
        packed = np.concatenate(
            [packed, np.zeros((total - n, w), dtype=np.uint32)], axis=0
        )
    slabs = packed.reshape(s, slab_items, w)
    gallery_gs = np.stack([
        to_grouped_layout(slabs[i], groups, col_multiple) for i in range(s)
    ])
    canon_bgs = np.stack([
        to_group_major(slabs[i], groups, col_multiple).reshape(
            slab_items // groups, groups * w
        )
        for i in range(s)
    ])
    valids = np.clip(n - np.arange(s) * slab_items, 0, slab_items).astype(
        np.int32
    )
    return (
        jnp.asarray(gallery_gs), jnp.asarray(canon_bgs),
        jnp.asarray(valids), slab_items,
    )


@functools.partial(
    jax.jit,
    static_argnames=("n", "k", "slab_items", "query_tile", "col_block",
                     "interpret", "mode"),
)
def mxu_topk_slabbed(
    packed_q: jnp.ndarray,
    gallery_gs: jnp.ndarray,
    canon_bgs: jnp.ndarray,
    valids: jnp.ndarray,
    n: int,
    slab_items: int,
    k: int = 100,
    query_tile: int = 128,
    col_block: int = 128,
    interpret: bool = False,
    mode: str = "exact",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over a slabbed gallery (same contract as mxu_topk:
    oracle rank order, sentinels d=bits+1 / i=n beyond the valid count).
    In approx mode each slab runs its ApproxTopK path and the merge is
    exact over the per-slab candidates."""
    from hashgan_tpu.ops.mxu_large_k import mxu_topk_large
    from hashgan_tpu.ops.mxu_scan import mxu_topk

    q, w = packed_q.shape
    s = gallery_gs.shape[0]
    _, _, L, c = gallery_gs.shape
    n_tot_slab = L * c
    bits = 32 * w
    kk_loc = min(k, n_tot_slab)

    def body(carry, slab):
        g, bg, v = slab
        if mode == "exact" and kk_loc <= 256:
            d, i = mxu_topk(
                packed_q, g, bg, valid_n=v, k=kk_loc,
                query_tile=query_tile, col_block=col_block,
                interpret=interpret, mode=mode,
            )
        else:
            d, i = mxu_topk_large(
                packed_q, g, bg, valid_n=v, k=kk_loc,
                query_tile=query_tile, col_block=col_block,
                interpret=interpret, mode=mode,
            )
        return carry, (d, i)

    _, (ds, is_) = jax.lax.scan(
        body, None, (gallery_gs, canon_bgs, valids)
    )                                       # (S, Q, kk_loc) each
    offs = (jnp.arange(s, dtype=jnp.int32) * slab_items)[:, None, None]
    is_glob = is_ + offs
    cat_d = jnp.moveaxis(ds, 0, 1).reshape(q, -1)
    cat_i = jnp.moveaxis(is_glob, 0, 1).reshape(q, -1)
    n_cand = cat_d.shape[1]
    position = jax.lax.broadcasted_iota(jnp.int32, (q, n_cand), 1)
    # position key: slab lists are (d asc, idx asc) over contiguous
    # ascending index ranges -> (d, position) == (d, global idx). Sentinels
    # (d = bits+1 from the slab engines) get distinct keys that sort last.
    key = jnp.minimum(cat_d, bits + 1) * jnp.int32(n_cand) + position
    kk = min(k, s * kk_loc)
    # lax.top_k at every kk: position makes keys distinct (no tie concern)
    # and the round-3 profile measured top_k 5-14x faster than the
    # counting-select + scatter compaction at every width tried
    # (docs/BENCHMARKS.md "large-k phase profile") — the sharded twin
    # defaults to top_k for the same reason.
    _, pos = jax.lax.top_k(-key, kk)
    d_out = jnp.take_along_axis(cat_d, pos, axis=1)
    i_out = jnp.take_along_axis(cat_i, pos, axis=1)
    sent = d_out > bits
    return jnp.where(sent, bits + 1, d_out), jnp.where(sent, n, i_out)
