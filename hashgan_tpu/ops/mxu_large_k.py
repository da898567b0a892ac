"""Exact large-k top-k (k up to thousands) on the MXU scan.

The flagship engine (ops/mxu_scan.py) rescans the k winning COLUMNS, which
gathers k*L items/query — perfect at k <= 256, but a MAP@5000-shaped query
(the reference protocol's R — SURVEY.md §3.3, expected ref util.py MAPs
R=5000) would gather 5000*128 = 640k items/query. This engine keeps the
identical scan but tightens the selection granularity from columns (L=128
items) to SUBGROUPS of ``sigma`` (default 16) consecutive sublanes:

- The kernel emits the min key of every (column, subgroup) cell: output
  (Q, R, C) with R = L/sigma, 8x the minima of the column engine but still
  ~2000x smaller than the full distance matrix.
- Rank bound (same proof as the column engine, one level finer): any true
  top-k item lives in a subgroup whose min key is <= the k-th best key
  overall, and at most k subgroups can have min <= that bound (their mins
  are k distinct item keys). So rescanning the k smallest-min subgroups —
  k*sigma items, 8x fewer than k*L — is exact.
- The rescan rows are sigma*W-word slices of the SAME group-major canonical
  copy the column engine gathers from (a reshape, no extra HBM).
- Selection over the wide minima/rescan arrays is pluggable (static arg):
  ``twolevel`` (default) reuses the rank-bound min-reduction built on
  lax.top_k (which degrades to ONE direct top_k when the reduction cannot
  shrink the problem — the common case at k=5000); ``radix`` is a counting
  select: a multi-pivot threshold search (P pivots per round, ~7 passes
  over the int32 key space) finds the exact k-th smallest key, then a
  cumsum scatter (or searchsorted gather) compacts the exactly-k
  survivors. Both are exact on the DISTINCT composite keys. MEASURED on
  v5e (1M x 128-bit, 1024 q, k=5000 — docs/BENCHMARKS.md round 3): the
  threshold search itself is HBM-bound and fine (44 ms over the 65536-wide
  minima), but BOTH compaction schemes are catastrophic on TPU (scatter
  538 ms, vmapped searchsorted 1612 ms — XLA scatters serialize), while
  lax.top_k over the same array is 114 ms and returns sorted keys for
  free; ``radix`` stays as the documented negative result. ``sortdecode``
  (the DEFAULT) exploits that composite keys are self-identifying
  (key % stride = global item index): a VALUE-ONLY lax.sort replaces
  top_k's variadic key+iota sort and winner identities decode
  arithmetically from the sorted keys. Measured on v5e (same shapes):
  sort-only is 1.8x cheaper than top_k at every width (50.7 vs 91.2 ms at
  65536-wide), lifting the engine to 15.4e9 cmp/s at k=1000 and 5.9e9 at
  k=5000 (from 13.2 / 3.8 with twolevel). The k=5000 floor is now the two
  value-only sorts themselves (128 ms of the 181 ms total): an in-kernel
  counting select with lane compaction would beat them, but Mosaic
  exposes no lane-permute primitive — recorded as the honest ceiling.

Total order is the same oracle contract: (distance asc, database index
asc); composite keys d*stride + idx are globally distinct, padding slots
get distinct above-any-valid keys (bits+1)*stride + idx so counting stays
exact even on under-filled galleries.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hashgan_tpu.ops.mxu_scan import (
    PAD_PENALTY,
    build_key_base,
    unpack_to_pm1,
    _twolevel_topk_min,
)


def _mxu_subgroupmin_kernel(q_ref, g_ref, base_ref, min_ref, gb_ref, *,
                            half_l, r_sub):
    """q (Tq, B) bf16 ±1; g (W, L, Cb) uint32; base (L, Cb) f32;
    min out (Tq, R, Cb) f32; gb scratch (B, L*Cb) bf16 ±1.

    Identical distance math to _mxu_groupmin_kernel; the only change is the
    reduction granularity: min over sigma-sublane slices instead of the full
    column."""
    w_words = g_ref.shape[0]
    L = g_ref.shape[1]
    cb = g_ref.shape[2]
    sigma = L // r_sub

    @pl.when(pl.program_id(1) == 0)  # unpack once per gallery block
    def _unpack():
        for w in range(w_words):  # static unroll
            gw = g_ref[w]                                    # (L, Cb) u32
            bitpos = jax.lax.broadcasted_iota(jnp.uint32, (32, L, cb), 0)
            bits = (gw[None, :, :] >> bitpos) & jnp.uint32(1)
            pm = (bits.astype(jnp.int32) * 2 - 1).astype(
                jnp.float32
            ).astype(jnp.bfloat16)
            gb_ref[w * 32 : (w + 1) * 32, :] = pm.reshape(32, L * cb)

    dot = jnp.dot(q_ref[:], gb_ref[:], preferred_element_type=jnp.float32)
    key = base_ref[:][None, :, :] - dot.reshape(
        dot.shape[0], L, cb
    ) * half_l
    for j in range(r_sub):  # static unroll: sigma-aligned sublane slices
        min_ref[:, j, :] = jnp.min(
            key[:, j * sigma : (j + 1) * sigma, :], axis=1
        )


@functools.partial(
    jax.jit, static_argnames=("r_sub", "query_tile", "col_block", "interpret")
)
def mxu_subgroupmin_scan(
    q_pm1: jnp.ndarray,
    gallery_g: jnp.ndarray,
    key_base: jnp.ndarray,
    r_sub: int,
    query_tile: int = 128,
    col_block: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """(Q, B) ±1 x (W, L, C) packed -> (Q, R, C) f32 subgroup-min keys."""
    q, b = q_pm1.shape
    w, L, c = gallery_g.shape
    assert b == 32 * w, (b, w)
    assert c % col_block == 0, (c, col_block)
    assert L % r_sub == 0, (L, r_sub)
    q_pad = pl.cdiv(q, query_tile) * query_tile
    if q_pad != q:
        q_pm1 = jnp.pad(q_pm1, ((0, q_pad - q), (0, 0)))
    kernel = functools.partial(
        _mxu_subgroupmin_kernel, half_l=float(L) / 2.0, r_sub=r_sub
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((q_pad, r_sub, c), jnp.float32),
        grid=(c // col_block, q_pad // query_tile),
        in_specs=[
            pl.BlockSpec((query_tile, b), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, L, col_block), lambda j, i: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, col_block), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (query_tile, r_sub, col_block), lambda j, i: (i, 0, j),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((b, L * col_block), jnp.bfloat16),
        ],
        interpret=interpret,
    )(q_pm1.astype(jnp.bfloat16), gallery_g, key_base)
    return out[:q]


def _subgroup_full_keys(min_sub: jnp.ndarray, L: int, c: int, stride: int,
                        bits: int) -> jnp.ndarray:
    """(Q, R, C) f32 subgroup-min keys -> (Q, R*C) DISTINCT int32 full
    composite keys d*stride + (s*C + col). The kernel key d*L + s embeds the
    GLOBAL sublane s (subgroup j spans s in [j*sigma, (j+1)*sigma)), so the
    item identity decodes without knowing j. All-padding subgroup mins
    (key >= PAD_PENALTY) map to the distinct above-any-valid key
    (bits+1)*stride + idx — NOT a shared sentinel, so counting selects stay
    exact on under-filled galleries."""
    q, r, _ = min_sub.shape
    key_i = min_sub.reshape(q, r * c).astype(jnp.int32)
    is_pad = key_i >= jnp.int32(PAD_PENALTY)
    s = key_i % L  # PAD_PENALTY is a multiple of L, so % L survives padding
    d = (key_i - jnp.where(is_pad, jnp.int32(PAD_PENALTY), 0)) // L
    cols = jax.lax.broadcasted_iota(jnp.int32, (q, r * c), 1) % c
    idx = s * c + cols
    return jnp.where(is_pad, (bits + 1) * stride + idx, d * stride + idx)


def count_select_threshold(keys: jnp.ndarray, kk: int, hi: int,
                           pivots: int = 16) -> jnp.ndarray:
    """Exact kk-th smallest of each row of (Q, M) DISTINCT non-negative
    int32 keys (kk <= M, all keys <= hi), via multi-pivot counting: each
    round partitions the live interval into ``pivots`` buckets and counts
    keys <= each bucket's upper edge (a fused broadcast-compare reduce; the
    (Q, M, P) intermediate never materializes), keeping the first bucket
    whose count reaches kk. ~log_P(hi) passes over the keys, no sort, no
    top_k. Returns (Q,) int32 thresholds tau with exactly kk keys <= tau
    per row."""
    q, m = keys.shape
    assert kk <= m, (kk, m)
    lo = jnp.zeros((q,), jnp.int32)
    width = hi + 1
    while width > 1:
        wb = -(-width // pivots)           # bucket width (static)
        edges = lo[:, None] + (
            jnp.arange(1, pivots + 1, dtype=jnp.int32)[None, :] * wb - 1
        )                                   # (Q, P) inclusive upper edges
        cnt = jnp.sum(
            keys[:, :, None] <= edges[:, None, :], axis=1, dtype=jnp.int32
        )                                   # (Q, P)
        b = jnp.argmax(cnt >= kk, axis=1).astype(jnp.int32)
        lo = lo + b * wb
        width = wb
    return lo


def _compact_masked(values: jnp.ndarray, mask: jnp.ndarray, kk: int,
                    method: str = "scatter") -> jnp.ndarray:
    """Dense-pack the exactly-kk masked entries of each (Q, M) row into
    (Q, kk), preserving array order. ``scatter``: cumsum positions + one
    batched scatter (unique indices; non-survivors get distinct
    out-of-bounds slots and drop). ``searchsorted``: binary-search the
    cumsum for each output slot, then gather."""
    q, m = values.shape
    cs = jnp.cumsum(mask.astype(jnp.int32), axis=1)
    if method == "searchsorted":
        targets = jnp.arange(1, kk + 1, dtype=jnp.int32)
        pos = jax.vmap(
            lambda row: jnp.searchsorted(row, targets, side="left")
        )(cs)
        return jnp.take_along_axis(values, pos, axis=1)
    pos = cs - 1
    slots = jnp.where(
        mask, pos, kk + jax.lax.broadcasted_iota(jnp.int32, (q, m), 1)
    )
    out = jnp.zeros((q, kk), values.dtype)
    return out.at[
        jnp.arange(q, dtype=jnp.int32)[:, None], slots
    ].set(values, mode="drop", unique_indices=True)


def _rescan_winner_subgroups(packed_q, canon_sub, rows, sigma, L, c, w,
                             stride, bits, valid_n):
    """Exact composite keys for every item of the winner subgroups.

    canon_sub: (C*R, sigma*W) uint32 rows (a reshape of the group-major
    canonical copy: row c*R + j = items s in [j*sigma, (j+1)*sigma) of
    column c); rows: (Q, Mw) winner row ids. Returns (Q, Mw*sigma) DISTINCT
    int32 keys; layout-padding items get (bits+1)*stride + idx."""
    q = packed_q.shape[0]
    mw = rows.shape[1]
    r_sub = L // sigma
    taken = jnp.take(canon_sub, rows, axis=0)            # (Q, Mw, sigma*W)
    codes = taken.reshape(q, mw, sigma, w)
    x = codes ^ packed_q[:, None, None, :]
    d = jax.lax.population_count(x).astype(jnp.int32).sum(axis=-1)
    col = rows // r_sub                                   # (Q, Mw)
    j = rows % r_sub
    s = j[:, :, None] * sigma + jnp.arange(sigma, dtype=jnp.int32)[None, None]
    idx = s * c + col[:, :, None]
    key = jnp.where(
        idx < valid_n, d * stride + idx, (bits + 1) * stride + idx
    )
    return key.reshape(q, mw * sigma)


@functools.partial(
    jax.jit,
    static_argnames=("k", "sigma", "query_tile", "col_block", "interpret",
                     "mode", "select", "compact", "recall_target"),
)
def mxu_topk_large(
    packed_q: jnp.ndarray,
    gallery_g: jnp.ndarray,
    canon_bg_flat: jnp.ndarray,
    valid_n: jnp.ndarray | int,
    k: int = 1000,
    sigma: int = 16,
    query_tile: int = 128,
    col_block: int = 128,
    interpret: bool = False,
    mode: str = "exact",
    select: str = "sortdecode",
    compact: str = "scatter",
    recall_target: float = 0.95,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k for large k via subgroup-min scan + winner-subgroup
    rescan. Same contract as mxu_topk: returns (dists (Q, kk), indices
    (Q, kk)) in oracle rank order; entries with index >= valid_n are
    padding sentinels (d = bits+1, i = n_total). No fallback path; latency
    is data-independent.

    mode="approx": ApproxTopK over the subgroup minima, no rescan (recall =
    ApproxTopK recall x the subgroup-collision term — sigma=16 collides 8x
    less than the column engine's approx mode at equal k).
    """
    q, w = packed_q.shape
    _, L, c = gallery_g.shape
    n_total = L * c
    bits = 32 * w
    stride = n_total + 1
    sigma = min(sigma, L)  # small (test) layouts: degrade toward columns
    assert L % sigma == 0, (L, sigma)
    r_sub = L // sigma
    assert (bits + 2) * stride + n_total < 2**31, "composite key overflow"

    q_pm1 = unpack_to_pm1(packed_q)
    key_base = build_key_base(L, c, bits, valid_n)
    min_sub = mxu_subgroupmin_scan(
        q_pm1, gallery_g, key_base, r_sub=r_sub,
        query_tile=query_tile, col_block=col_block, interpret=interpret,
    )                                                    # (Q, R, C)
    kk = min(k, n_total)
    m1 = r_sub * c
    m_win = min(kk, m1)

    if mode == "approx":
        vals, us = jax.lax.approx_min_k(
            min_sub.reshape(q, m1), m_win, recall_target=recall_target
        )
        key = vals.astype(jnp.int32)
        is_pad = key >= jnp.int32(PAD_PENALTY)
        s = key % L
        d = jnp.where(is_pad, bits + 1, key // L)
        i = jnp.where(is_pad, n_total, s * c + us % c)
        if m_win < kk:
            d = jnp.pad(d, ((0, 0), (0, kk - m_win)), constant_values=bits + 1)
            i = jnp.pad(i, ((0, 0), (0, kk - m_win)), constant_values=n_total)
        return d, i

    full = _subgroup_full_keys(min_sub, L, c, stride, bits)  # (Q, M1)
    hi = (bits + 1) * stride + n_total
    if select == "twolevel":
        _, us = _twolevel_topk_min(full, m_win)
    elif select == "sortdecode":
        # Value-only sort: composite keys are DISTINCT and self-identifying
        # (key % stride is the global item index), so the winner positions
        # decode arithmetically and the sort never carries an index payload
        # (lax.top_k's variadic key+iota sort moves 2x the bytes).
        top1 = jax.lax.sort(full, dimension=1, is_stable=False)[:, :m_win]
        i1 = top1 % stride                    # global item idx = s*C + col
        us = (i1 // c // sigma) * c + i1 % c  # subgroup row j*C + col
    else:
        tau_w = count_select_threshold(full, m_win, hi)
        us = _compact_masked(
            jax.lax.broadcasted_iota(jnp.int32, (q, m1), 1),
            full <= tau_w[:, None], m_win, method=compact,
        )
    # winner subgroup u = j*C + col -> canonical rescan row col*R + j
    rows = (us % c) * r_sub + us // c
    canon_sub = canon_bg_flat.reshape(c * r_sub, sigma * w)
    rescan = _rescan_winner_subgroups(
        packed_q, canon_sub, rows, sigma, L, c, w, stride, bits, valid_n
    )                                                    # (Q, m_win*sigma)
    if select == "twolevel":
        final, _ = _twolevel_topk_min(rescan, kk)
    elif select == "sortdecode":
        final = jax.lax.sort(rescan, dimension=1, is_stable=False)[:, :kk]
    else:
        tau_f = count_select_threshold(rescan, kk, hi)
        packed_keys = _compact_masked(
            rescan, rescan <= tau_f[:, None], kk, method=compact
        )
        final = jnp.sort(packed_keys, axis=1)
    is_pad = final // stride > bits
    d = jnp.where(is_pad, bits + 1, final // stride)
    i = jnp.where(is_pad, n_total, final % stride)
    return d, i
