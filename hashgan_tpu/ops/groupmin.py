"""Fused Hamming-scan + in-kernel group-min selection (on-chip top-k).

This is the engine behind fast EXACT top-k (SURVEY.md §7 "hard part #1").
The sort-based merge (ops/hamming.py mode="exact") pays lax.top_k over every
slab — ~150x the cost of the distance math. Here selection happens inside
the Pallas kernel:

- The gallery lives in a *grouped scan layout* (W, L, C): item
  ``n = s * C + c`` is word-sliced at ``[w, s, c]``. Groups are the L-item
  sublane fibers at a fixed column c — so a group-min is a single
  cross-sublane VPU reduction, the cheapest reduction the hardware has.
- The kernel computes composite keys ``key = d * stride + idx`` (distance-
  major, index-minor — the same total order as the numpy oracle) and emits
  per (query, column): the smallest and the second-smallest key in the
  group. HBM sees (Q, C) x2 int32 instead of (Q, N): an L/2-fold write
  reduction, and the top_k merge shrinks by L.
- Exactness: the true top-k can only be missed if a group hides >= 2
  members. Any such group has ``min2 <= kth-best key``, so a repair pass
  gathers the (rare) flagged groups' items, rescans them exactly, and
  re-merges. If more groups are flagged than the static repair capacity
  (degenerate data: everything tied), the caller falls back to the
  sort-based exact scan — correctness never depends on the data.

The index is recoverable from the key (``idx = key % stride``) so no
separate argmin bookkeeping is needed.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT32_MAX = jnp.iinfo(jnp.int32).max


def to_grouped_layout(
    packed: np.ndarray, groups: int = 128, col_multiple: int = 256
) -> np.ndarray:
    """(N, W) canonical packed codes -> (W, L, C) grouped scan layout.

    C is padded to a multiple of ``col_multiple`` (the kernel's column
    block) so the kernel's idx formula ``s * C + c`` matches the layout
    exactly; padding items occupy the tail indices (>= N) and are masked
    by valid_n in the kernel.
    """
    n, w = packed.shape
    L = groups
    c = -(-n // (L * col_multiple)) * col_multiple
    n_pad = L * c
    if n_pad != n:
        packed = np.concatenate(
            [packed, np.zeros((n_pad - n, w), dtype=packed.dtype)], axis=0
        )
    # item n = s * C + c  ->  [w, s, c]
    return np.ascontiguousarray(
        packed.reshape(L, c, w).transpose(2, 0, 1)
    )


# Padding addend base: padded items get key >= PAD_BASE, strictly above any
# valid key (max valid key = max_d*stride + n < (b+1)*(n+1) asserted < PAD_BASE
# range) while staying clear of int32 overflow after + max_d*stride.
PAD_BASE = 1_000_000_000


def groupmin_capacity_ok(
    n_total: int, words: int, groups: int = 128, col_multiple: int = 256,
    pad_base: int = PAD_BASE,
) -> bool:
    """Whether an n-item gallery fits the grouped engine's int32 key space
    (~7.7M items at 128 bits, ~15M at 64, ~30M at 32). Beyond it the gallery
    builder skips the grouped layout and queries degrade gracefully to the
    ceiling-free sort engine (ops/hamming.py) instead of tripping asserts.
    ``n_total`` is padded to the layout unit before the check."""
    unit = groups * col_multiple
    n_pad = -(-max(n_total, 1) // unit) * unit
    stride = n_pad + 1
    return (32 * words + 1) * stride + n_pad < pad_base


def build_addend(L: int, cols: int, valid_n) -> jnp.ndarray:
    """(L, cols) int32 key addend: idx for valid items, PAD_BASE + idx for
    padding — precomputed once per gallery so the kernel does one add
    instead of iota + index math + mask. ``valid_n`` may be traced."""
    s_ids = jax.lax.broadcasted_iota(jnp.int32, (L, cols), 0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (L, cols), 1)
    idx = s_ids * cols + c_ids
    return jnp.where(idx < valid_n, idx, idx + PAD_BASE)


def _groupmin_kernel(q_ref, g_ref, add_ref, min_ref, min2_ref, *, stride):
    """q (Tq, W) uint32; g (W, L, Cb) uint32; add (L, Cb) int32;
    outs (Tq, Cb) int32."""
    w_words = q_ref.shape[1]

    dist = None
    for w in range(w_words):  # static unroll
        x = q_ref[:, w][:, None, None] ^ g_ref[w][None, :, :]
        p = jax.lax.population_count(x).astype(jnp.int32)
        dist = p if dist is None else dist + p

    key = dist * stride + add_ref[:][None, :, :]
    min1 = jnp.min(key, axis=1)
    is_min = key == min1[:, None, :]
    key2 = jnp.where(is_min, INT32_MAX, key)
    min2 = jnp.min(key2, axis=1)
    min_ref[:] = min1
    min2_ref[:] = min2


@functools.partial(
    jax.jit,
    static_argnames=("query_tile", "col_block", "interpret"),
)
def groupmin_scan(
    packed_q: jnp.ndarray,
    gallery_g: jnp.ndarray,
    valid_n: jnp.ndarray | int,
    query_tile: int = 32,
    col_block: int = 256,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(Q, W) x (W, L, C) -> (min_keys, min2_keys), each (Q, C) int32.

    valid_n may be traced: it enters via the precomputed addend input (one
    in-kernel add replaces iota + index math + padding mask)."""
    q, w = packed_q.shape
    _, L, c = gallery_g.shape
    n_total = L * c
    stride = n_total + 1
    # Valid keys must stay below PAD_BASE (padding region), which also
    # bounds int32: caps a single gallery/shard at ~7.7M items at 128 bits.
    # Larger galleries never reach here — build_gallery_from_packed checks
    # groupmin_capacity_ok and routes them to the sort engine instead.
    assert (32 * w + 1) * stride + n_total < PAD_BASE, (
        "grouped engine key overflow — the gallery builder should have "
        "declined the grouped layout (groupmin_capacity_ok)"
    )
    assert c % col_block == 0, (
        f"grouped layout cols {c} not a multiple of col_block {col_block}; "
        "build the layout with to_grouped_layout(col_multiple=col_block)"
    )
    q_pad = -(-q // query_tile) * query_tile
    if q_pad != q:
        packed_q = jnp.pad(packed_q, ((0, q_pad - q), (0, 0)))

    addend = build_addend(L, c, valid_n)
    kernel = functools.partial(_groupmin_kernel, stride=stride)
    outs = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((q_pad, c), jnp.int32),
            jax.ShapeDtypeStruct((q_pad, c), jnp.int32),
        ),
        grid=(q_pad // query_tile, c // col_block),
        in_specs=[
            pl.BlockSpec((query_tile, w), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, L, col_block), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, col_block), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((query_tile, col_block), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, col_block), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(packed_q, gallery_g, addend)
    min1, min2 = outs
    return min1[:q], min2[:q]


def _rescan_groups(packed_q, packed_canonical, group_cols, cols, L, stride,
                   valid_n):
    """Exactly rescan M groups per query.

    group_cols: (Q, M) int32 column ids. Returns keys (Q, M*L) int32."""
    q, w = packed_q.shape
    m = group_cols.shape[1]
    s_ids = jnp.arange(L, dtype=jnp.int32)[None, None, :]        # (1,1,L)
    idx = s_ids * cols + group_cols[:, :, None]                   # (Q,M,L)
    idx_c = jnp.clip(idx, 0, packed_canonical.shape[0] - 1)
    codes = packed_canonical[idx_c]                               # (Q,M,L,W)
    x = codes ^ packed_q[:, None, None, :]
    d = jax.lax.population_count(x).astype(jnp.int32).sum(axis=-1)
    key = d * stride + idx
    key = jnp.where(idx < valid_n, key, INT32_MAX)
    return key.reshape(q, m * L)


@functools.partial(
    jax.jit,
    static_argnames=("k", "repair", "query_tile", "col_block",
                     "interpret", "exact"),
)
def groupmin_topk(
    packed_q: jnp.ndarray,
    gallery_g: jnp.ndarray,
    packed_canonical: jnp.ndarray,
    valid_n: jnp.ndarray | int,
    k: int = 100,
    repair: int = 8,
    exact: bool = True,
    query_tile: int = 32,
    col_block: int = 256,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Group-min top-k scan. ``valid_n`` may be traced (sharded shards pass
    their local counts).

    Returns (dists (Q,kk), indices (Q,kk), needs_fallback (Q,) bool), with
    kk = min(k, capacity). Slots beyond the valid count carry sentinel keys
    (huge distances). When ``exact`` and a query flags more than ``repair``
    suspicious groups, its needs_fallback is True and the caller must
    recompute that query with the sort-based exact path (ops/hamming.py) —
    everything else is exact.
    """
    q, w = packed_q.shape
    _, L, c = gallery_g.shape
    n_total = L * c
    stride = n_total + 1
    max_d = 32 * w

    def decode(keys):
        # Padding keys (>= PAD_BASE, incl. the INT32_MAX rescan sentinel)
        # would otherwise decode to an in-range index with a huge distance —
        # violating topk's "index >= n means padding" contract. Force true
        # sentinels: d > max_d, i = n_total (>= any valid_n).
        is_pad = keys >= PAD_BASE
        d = jnp.where(is_pad, max_d + 1, keys // stride)
        i = jnp.where(is_pad, n_total, keys % stride)
        return d, i

    min1, min2 = groupmin_scan(
        packed_q, gallery_g, valid_n,
        query_tile=query_tile, col_block=col_block, interpret=interpret,
    )
    kk = min(k, n_total)
    neg1, _ = jax.lax.top_k(-min1, kk)               # prelim winners
    prelim_keys = -neg1                              # (Q, kk) ascending
    if not exact:
        d, i = decode(prelim_keys)
        return d, i, jnp.zeros((q,), bool)

    kth = prelim_keys[:, -1:]                        # (Q, 1)
    flagged = min2 <= kth                            # (Q, C) suspicious groups
    n_flagged = flagged.sum(axis=1)
    # repair >= kk makes fallback unreachable: every flagged group has
    # min1 <= min2 <= kth, and exactly kk groups have min1 <= kth (keys are
    # distinct), so n_flagged <= kk. Clamping to C is lossless (flagged is a
    # set of groups).
    repair = min(repair, c)
    needs_fallback = n_flagged > repair

    # Take the `repair` smallest min2 groups: a superset of the flagged set
    # whenever n_flagged <= repair.
    _, cand_cols = jax.lax.top_k(-min2, repair)      # (Q, M)
    rescan_keys = _rescan_groups(
        packed_q, packed_canonical, cand_cols, c, L, stride, valid_n
    )
    # Drop prelim entries that live in a rescanned group (they reappear in
    # rescan_keys; duplicates would displace legitimate winners).
    prelim_cols = (prelim_keys % stride) % c         # idx % cols = column
    dup = (prelim_cols[:, :, None] == cand_cols[:, None, :]).any(axis=2)
    prelim_masked = jnp.where(dup, INT32_MAX, prelim_keys)
    all_keys = jnp.concatenate([prelim_masked, rescan_keys], axis=1)
    negk, _ = jax.lax.top_k(-all_keys, kk)
    final = -negk
    d, i = decode(final)
    return d, i, needs_fallback
