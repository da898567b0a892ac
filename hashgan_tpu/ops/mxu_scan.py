"""MXU matmul-distance Hamming scan with group-min selection.

The round-1 engine (ops/groupmin.py) computes XOR-popcount distances on the
VPU at ~16 ops/comparison — measured saturated (docs/BENCHMARKS.md). This
engine moves the distance math to the MXU, where the FLOPs are free:

- Packed gallery words are unpacked IN-KERNEL to ±1 bfloat16 (bit-compare +
  select; ~4 VPU ops/bit, amortized over every query tile that reuses the
  block — the unpack runs once per gallery block, at query-tile 0).
- Hamming distance comes from one matmul: for ±1 vectors,
  ``d = (B - q·g) / 2`` — and because products are ±1 and B <= 128, the f32
  accumulation is EXACT (integers far below 2^24).
- Selection stays on the VPU but costs ~2 ops/comparison: a single fused
  multiply-add folds distance + group-local tie-break + padding penalty into
  one f32 key, then a cross-sublane min per group:
      key = d*L + s + pad_penalty  ==  (B*L/2 + s + penalty) - (L/2)*q·g
  Valid keys are < 2^15 and penalties < 2^23, all exactly representable.

Exactness WITHOUT a repair/fallback path (simpler than groupmin.py's min2):
the kernel emits only each group's min. A group can contribute a true top-k
member only if its min key is <= the k-th best key overall, and the k-th
smallest GROUP MIN is an upper bound for the k-th best key overall — so the
k winning groups (and only they) can hold top-k members. The engine rescans
exactly those k columns per query with a structured gather (2KB rows from a
group-major canonical copy — lane-aligned, unlike a (N, W) row gather) and
takes the final top-k from the rescan alone. No flags, no host sync, no
data-dependent cliff: every query costs the same.

Total order matches the numpy oracle: (distance asc, database index asc).
The group key encodes (d, s); equal keys across columns tie-break by column
position == column id c, and global index = s*C + c is exactly (s, c)-major.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hashgan_tpu.ops.groupmin import INT32_MAX

# Padding penalty: pushed onto the key of layout-padding slots (idx >=
# valid_n). Valid keys are <= B*L + L-1 = 16511; penalized keys >= 2^22.
# Max possible kernel value = penalty + B*L + L < 2^24 -> f32-exact.
PAD_PENALTY = float(1 << 22)


def to_group_major(packed: np.ndarray, groups: int = 128,
                   col_multiple: int = 256) -> np.ndarray:
    """(N, W) canonical packed codes -> (C, L, W) group-major layout for the
    winner-column rescan gather: column c's L items are one contiguous
    2KB-scale row (L*W words), so ``take(cols)`` moves lane-aligned rows
    instead of W-word slivers. Same item mapping as to_grouped_layout:
    item n = s*C + c lives at [c, s]."""
    n, w = packed.shape
    L = groups
    c = -(-n // (L * col_multiple)) * col_multiple
    n_pad = L * c
    if n_pad != n:
        packed = np.concatenate(
            [packed, np.zeros((n_pad - n, w), dtype=packed.dtype)], axis=0
        )
    return np.ascontiguousarray(packed.reshape(L, c, w).transpose(1, 0, 2))


def unpack_to_pm1(packed: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """(Q, W) uint32 -> (Q, 32W) ±1 values (pack_codes bit order: bit i of
    word w = code[32w+i])."""
    q, w = packed.shape
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    bits = (packed[:, :, None] >> shifts) & jnp.uint32(1)
    return jnp.where(
        bits > 0, jnp.asarray(1.0, dtype), jnp.asarray(-1.0, dtype)
    ).reshape(q, w * 32)


def build_key_base(L: int, cols: int, bits: int, valid_n) -> jnp.ndarray:
    """(L, cols) f32 key base: B*L/2 + s (+ PAD_PENALTY for padding slots).
    ``valid_n`` may be traced."""
    s_ids = jax.lax.broadcasted_iota(jnp.int32, (L, cols), 0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (L, cols), 1)
    idx = s_ids * cols + c_ids
    base = (bits * L) / 2.0 + s_ids.astype(jnp.float32)
    return jnp.where(idx < valid_n, base, base + PAD_PENALTY)


def build_key_base_t(L: int, cols: int, bits: int, valid_n) -> jnp.ndarray:
    """(cols, L) transposed key base for the lane-major scan layout
    (layout="lane" in mxu_fullkey_scan): same values as build_key_base,
    group axis minor."""
    s_ids = jax.lax.broadcasted_iota(jnp.int32, (cols, L), 1)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (cols, L), 0)
    idx = s_ids * cols + c_ids
    base = (bits * L) / 2.0 + s_ids.astype(jnp.float32)
    return jnp.where(idx < valid_n, base, base + PAD_PENALTY)


def build_key_base_i32(L: int, cols: int, bits: int, valid_n) -> jnp.ndarray:
    """int32 key base for the int8 scan: same values as build_key_base but
    exact integers end-to-end (no f32 representability argument needed)."""
    s_ids = jax.lax.broadcasted_iota(jnp.int32, (L, cols), 0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (L, cols), 1)
    idx = s_ids * cols + c_ids
    base = (bits * L) // 2 + s_ids
    return jnp.where(idx < valid_n, base, base + jnp.int32(PAD_PENALTY))


def unpack_to_pm8(packed: jnp.ndarray) -> jnp.ndarray:
    """(Q, W) uint32 -> (Q, 32W) ±1 int8 (same bit order as unpack_to_pm1)."""
    q, w = packed.shape
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    bits = ((packed[:, :, None] >> shifts) & jnp.uint32(1)).astype(jnp.int8)
    return (bits * 2 - 1).reshape(q, w * 32)


@functools.partial(jax.jit, static_argnames=("col_block", "dtype"))
def grouped_to_pm8(gallery_g: jnp.ndarray, col_block: int = 128,
                   dtype=jnp.int8):
    """(W, L, C) uint32 grouped gallery -> (B, C//cb, L, cb) ±1 int8, laid
    out so BlockSpec block j = (B, 1, L, cb) is exactly the operand the
    int8 scan kernel feeds the MXU (rows = bit index w*32+i, matching
    unpack_to_pm8's query order). Device-side: builds from the already-
    resident packed gallery — no large host transfer (host->device is the
    slow path on this platform). 8x the packed bytes (1 byte/code-bit at
    int8): 1M x 128-bit = 134 MB of HBM."""
    w, L, c = gallery_g.shape
    nb = c // col_block
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, :, None, None]
    bits = ((gallery_g[:, None] >> shifts) & jnp.uint32(1)).astype(jnp.int8)
    pm = bits * 2 - 1                                    # (W, 32, L, C)
    if dtype != jnp.int8:
        pm = pm.astype(dtype)
    pm = pm.reshape(w * 32, L, nb, col_block)
    return pm.transpose(0, 2, 1, 3)  # XLA materializes the transpose


def _pm_groupmin_kernel(q_ref, g_ref, base_ref, min_ref, *, half_l,
                        acc_dtype):
    """q (Tq, B) ±1; g (B, 1, L, Cb) ±1 precomputed (no unpack phase, so
    the MXU never waits on the VPU); base (L, Cb); min out (Tq, Cb).
    Works for int8 operands with int32 accumulate (exact integers) and
    bf16 operands with f32 accumulate (exact: products ±1, B <= 128)."""
    b = g_ref.shape[0]
    L = g_ref.shape[2]
    cb = g_ref.shape[3]
    g = g_ref[:, 0].reshape(b, L * cb)
    dot = jnp.dot(q_ref[:], g, preferred_element_type=acc_dtype)
    key = base_ref[:][None, :, :] - dot.reshape(
        dot.shape[0], L, cb
    ) * half_l
    min_ref[:] = jnp.min(key, axis=1)


@functools.partial(
    jax.jit, static_argnames=("query_tile", "interpret")
)
def mxu8_groupmin_scan(
    q_pm: jnp.ndarray,
    gallery_pm: jnp.ndarray,
    key_base: jnp.ndarray,
    query_tile: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """(Q, B) ±1 x (B, NB, L, cb) ±1 precomputed gallery -> (Q, NB*cb) min
    keys. Operand dtype selects the pipeline: int8 -> int32 keys, bf16 ->
    f32 keys (both exact). MEASURED on v5e (1M x 128-bit x 1024q): int8
    15.8 ms vs 6.5 ms for the in-kernel-unpack engine — Mosaic does not
    hit a native int8 MXU rate there and streaming 8x the bytes from HBM
    loses to the overlapped unpack. OFF by default; kept (tested) for
    hardware where int8 matmul runs at its native 2x rate. Platform note:
    the axon remote compiler handled the 128-bit shapes but HUNG compiling
    a 64-bit (W=2) int8 instance — if an opt-in build stalls, check the
    word count before suspecting this code."""
    q, b = q_pm.shape
    _, nb, L, cb = gallery_pm.shape
    int_path = gallery_pm.dtype == jnp.int8
    acc = jnp.int32 if int_path else jnp.float32
    half_l = L // 2 if int_path else float(L) / 2.0
    q_pad = pl.cdiv(q, query_tile) * query_tile
    if q_pad != q:
        q_pm = jnp.pad(q_pm, ((0, q_pad - q), (0, 0)))
    kernel = functools.partial(_pm_groupmin_kernel, half_l=half_l,
                               acc_dtype=acc)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((q_pad, nb * cb), acc),
        grid=(nb, q_pad // query_tile),
        in_specs=[
            pl.BlockSpec((query_tile, b), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1, L, cb), lambda j, i: (0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, cb), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((query_tile, cb), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q_pm, gallery_pm, key_base)
    return out[:q]


def _mxu_groupmin_kernel(q_ref, g_ref, base_ref, min_ref, gb_ref, *, half_l):
    """q (Tq, B) bf16 ±1; g (W, L, Cb) uint32; base (L, Cb) f32;
    min out (Tq, Cb) f32; gb scratch (B, L*Cb) bf16 ±1.

    (A bias-row variant that emits finished keys straight from the matmul
    was measured SLOWER on-chip: padding K from 128 to 144 costs +12.5% MXU
    time, more than the one fused multiply-add per element it saves.)"""
    w_words = g_ref.shape[0]
    L = g_ref.shape[1]
    cb = g_ref.shape[2]

    @pl.when(pl.program_id(1) == 0)  # unpack once per gallery block
    def _unpack():
        for w in range(w_words):  # static unroll
            gw = g_ref[w]                                    # (L, Cb) u32
            bitpos = jax.lax.broadcasted_iota(
                jnp.uint32, (32, L, cb), 0
            )
            bits = (gw[None, :, :] >> bitpos) & jnp.uint32(1)
            # int arithmetic (2b-1) then numeric converts: Mosaic rejects an
            # i1-mask select straight into bf16 tiles (relayout error), and
            # f32<->uint32 bitcasts are unavailable — int32 -> f32 -> bf16
            # converts are the supported path (cf. ops/pack.py).
            pm = (bits.astype(jnp.int32) * 2 - 1).astype(
                jnp.float32
            ).astype(jnp.bfloat16)
            gb_ref[w * 32 : (w + 1) * 32, :] = pm.reshape(32, L * cb)

    dot = jnp.dot(q_ref[:], gb_ref[:], preferred_element_type=jnp.float32)
    key = base_ref[:][None, :, :] - dot.reshape(
        dot.shape[0], L, cb
    ) * half_l
    min_ref[:] = jnp.min(key, axis=1)


def _mxu_fullkey_kernel(q_ref, g_ref, base_ref, min_ref, gb_ref, *,
                        half_l, stride, c_total):
    """Like _mxu_groupmin_kernel, but the epilogue emits FINISHED int32
    composite keys ``d*stride + global_index`` (distinct per item, padding
    -> INT32_MAX) — so the host-side selection needs no elementwise decode
    pass over the (Q, C) array (round-4: the _full_column_keys pass was
    ~2.3 ms of the 14.2 ms 1M-query budget). Output: min (Tq, Cb) i32 full
    keys. (A second per-subgroup-minima output was tried and REJECTED by
    the Mosaic lowering — its (Tq, Cb/sub_g) block has a last dim < 128 —
    so the caller takes the subgroup minima with one fused XLA reshape-min
    over the key array instead; that pass is HBM-bound at ~35 MB, well
    under 0.1 ms at the 1M shape.)

    Decode stays f32-exact: local keys are < 2^24; the i32 arithmetic that
    follows is bounded by the caller's rescan-key assert (< 2^31)."""
    w_words = g_ref.shape[0]
    L = g_ref.shape[1]
    cb = g_ref.shape[2]

    @pl.when(pl.program_id(1) == 0)  # unpack once per gallery block
    def _unpack():
        for w in range(w_words):  # static unroll
            gw = g_ref[w]                                    # (L, Cb) u32
            bitpos = jax.lax.broadcasted_iota(
                jnp.uint32, (32, L, cb), 0
            )
            bits = (gw[None, :, :] >> bitpos) & jnp.uint32(1)
            pm = (bits.astype(jnp.int32) * 2 - 1).astype(
                jnp.float32
            ).astype(jnp.bfloat16)
            gb_ref[w * 32 : (w + 1) * 32, :] = pm.reshape(32, L * cb)

    dot = jnp.dot(q_ref[:], gb_ref[:], preferred_element_type=jnp.float32)
    key = base_ref[:][None, :, :] - dot.reshape(
        dot.shape[0], L, cb
    ) * half_l
    colmin = jnp.min(key, axis=1).astype(jnp.int32)      # (Tq, Cb) local keys
    is_pad = colmin >= jnp.int32(PAD_PENALTY)
    if L & (L - 1) == 0:  # L is a power of two in every layout we build
        shift = L.bit_length() - 1
        d = jax.lax.shift_right_logical(colmin, shift)
        s = jnp.bitwise_and(colmin, jnp.int32(L - 1))
    else:
        d = colmin // L
        s = colmin % L
    # Pad lanes carry PAD_PENALTY-sized d values whose d*stride would
    # overflow int32; zero them before composing (the select below discards
    # them anyway — this just keeps the arithmetic overflow-free).
    d = jnp.where(is_pad, 0, d)
    s = jnp.where(is_pad, 0, s)
    cols = (pl.program_id(0) * cb
            + jax.lax.broadcasted_iota(jnp.int32, colmin.shape, 1))
    full = d * jnp.int32(stride) + s * jnp.int32(c_total) + cols
    min_ref[:] = jnp.where(is_pad, INT32_MAX, full)


def _mxu_fullkey_kernel_lanes(q_ref, g_ref, baset_ref, min_ref, gb_ref, *,
                              half_l, stride, c_total):
    """Lane-major layout variant of _mxu_fullkey_kernel: the unpacked block
    is flattened (cb, L)-major so the group-min reduces over the MINOR
    (lane) axis — log-step lane shuffles — instead of a cross-sublane
    strided min over L. baset: (Cb, L) transposed key base
    (build_key_base_t). One extra in-kernel transpose of the unpacked
    block per gallery block, amortized over all query tiles. Emits the
    same finished int32 composite keys as the sublane kernel."""
    w_words = g_ref.shape[0]
    L = g_ref.shape[1]
    cb = g_ref.shape[2]

    @pl.when(pl.program_id(1) == 0)  # unpack once per gallery block
    def _unpack():
        for w in range(w_words):  # static unroll
            gw = g_ref[w]                                    # (L, Cb) u32
            bitpos = jax.lax.broadcasted_iota(
                jnp.uint32, (32, L, cb), 0
            )
            bits = (gw[None, :, :] >> bitpos) & jnp.uint32(1)
            pm = (bits.astype(jnp.int32) * 2 - 1).astype(
                jnp.float32
            ).astype(jnp.bfloat16)
            gb_ref[w * 32 : (w + 1) * 32, :] = pm.transpose(0, 2, 1).reshape(
                32, cb * L)

    dot = jnp.dot(q_ref[:], gb_ref[:], preferred_element_type=jnp.float32)
    key = baset_ref[:][None, :, :] - dot.reshape(
        dot.shape[0], cb, L
    ) * half_l
    colmin = jnp.min(key, axis=2).astype(jnp.int32)      # lane reduction
    is_pad = colmin >= jnp.int32(PAD_PENALTY)
    if L & (L - 1) == 0:
        shift = L.bit_length() - 1
        d = jax.lax.shift_right_logical(colmin, shift)
        s = jnp.bitwise_and(colmin, jnp.int32(L - 1))
    else:
        d = colmin // L
        s = colmin % L
    d = jnp.where(is_pad, 0, d)  # keep d*stride overflow-free on pad lanes
    s = jnp.where(is_pad, 0, s)
    cols = (pl.program_id(0) * cb
            + jax.lax.broadcasted_iota(jnp.int32, colmin.shape, 1))
    full = d * jnp.int32(stride) + s * jnp.int32(c_total) + cols
    min_ref[:] = jnp.where(is_pad, INT32_MAX, full)


@functools.partial(
    jax.jit,
    static_argnames=("stride", "c_total", "query_tile", "col_block",
                     "sub_g", "interpret", "layout"),
)
def mxu_fullkey_scan(
    q_pm1: jnp.ndarray,
    gallery_g: jnp.ndarray,
    key_base: jnp.ndarray,
    stride: int,
    c_total: int,
    query_tile: int = 128,
    col_block: int = 128,
    sub_g: int = 16,
    interpret: bool = False,
    layout: str = "sublane",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(Q, B) ±1 x (W, L, C) packed -> ((Q, C) i32 full composite keys,
    (Q, C // sub_g) i32 subgroup minima). Exact-path variant of
    mxu_groupmin_scan (which still serves approx mode + the pm8 path).

    layout="sublane" (default): unpacked block (L, cb)-flat, group min is a
    cross-sublane strided reduction; key_base is (L, C) (build_key_base).
    layout="lane": unpacked block (cb, L)-flat, group min reduces over the
    minor lane axis; key_base must be (C, L) (build_key_base_t). Identical
    results; measured alternative for the VPU-epilogue-bound scan phase."""
    q, b = q_pm1.shape
    w, L, c = gallery_g.shape
    assert b == 32 * w, (b, w)
    assert c % col_block == 0, (c, col_block)
    assert col_block % sub_g == 0, (col_block, sub_g)
    q_pad = pl.cdiv(q, query_tile) * query_tile
    if q_pad != q:
        q_pm1 = jnp.pad(q_pm1, ((0, q_pad - q), (0, 0)))
    if layout == "lane":
        assert key_base.shape == (c, L), (key_base.shape, c, L)
        kernel = functools.partial(
            _mxu_fullkey_kernel_lanes, half_l=float(L) / 2.0, stride=stride,
            c_total=c_total,
        )
        base_spec = pl.BlockSpec((col_block, L), lambda j, i: (j, 0),
                                 memory_space=pltpu.VMEM)
    else:
        assert key_base.shape == (L, c), (key_base.shape, L, c)
        kernel = functools.partial(
            _mxu_fullkey_kernel, half_l=float(L) / 2.0, stride=stride,
            c_total=c_total,
        )
        base_spec = pl.BlockSpec((L, col_block), lambda j, i: (0, j),
                                 memory_space=pltpu.VMEM)
    full = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((q_pad, c), jnp.int32),
        grid=(c // col_block, q_pad // query_tile),
        in_specs=[
            pl.BlockSpec((query_tile, b), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, L, col_block), lambda j, i: (0, 0, j),
                         memory_space=pltpu.VMEM),
            base_spec,
        ],
        out_specs=pl.BlockSpec((query_tile, col_block), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((b, L * col_block), jnp.bfloat16),
        ],
        interpret=interpret,
    )(q_pm1.astype(jnp.bfloat16), gallery_g, key_base)
    full = full[:q]
    # Subgroup minima via one fused XLA reshape-min (see kernel docstring
    # for why this is not a second kernel output). Distinct-key property is
    # inherited: each minimum IS one of the distinct full keys.
    sub = jnp.min(full.reshape(q, c // sub_g, sub_g), axis=2)
    return full, sub


@functools.partial(
    jax.jit, static_argnames=("query_tile", "col_block", "interpret")
)
def mxu_groupmin_scan(
    q_pm1: jnp.ndarray,
    gallery_g: jnp.ndarray,
    key_base: jnp.ndarray,
    query_tile: int = 128,
    col_block: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """(Q, B) ±1 x (W, L, C) packed -> (Q, C) f32 min keys."""
    q, b = q_pm1.shape
    w, L, c = gallery_g.shape
    assert b == 32 * w, (b, w)
    assert c % col_block == 0, (c, col_block)
    q_pad = pl.cdiv(q, query_tile) * query_tile
    if q_pad != q:
        q_pm1 = jnp.pad(q_pm1, ((0, q_pad - q), (0, 0)))
    kernel = functools.partial(_mxu_groupmin_kernel, half_l=float(L) / 2.0)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((q_pad, c), jnp.float32),
        # gallery-block-major grid: the unpacked block in scratch is reused
        # by every query tile (program_id(1) is the fast axis)
        grid=(c // col_block, q_pad // query_tile),
        in_specs=[
            pl.BlockSpec((query_tile, b), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, L, col_block), lambda j, i: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, col_block), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((query_tile, col_block), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((b, L * col_block), jnp.bfloat16),
        ],
        interpret=interpret,
    )(q_pm1.astype(jnp.bfloat16), gallery_g, key_base)
    return out[:q]


def _rescan_winner_columns(packed_q, canon_bg_flat, cols, L, c_total, w,
                           stride, valid_n):
    """Exact (d, idx) keys for every item of the winner columns.

    canon_bg_flat: (C, L*W) uint32 group-major rows; cols: (Q, M) winner
    column ids. Returns (Q, M*L) int32 composite keys (invalid -> INT32_MAX).
    The take() moves contiguous lane-aligned rows (L*W words each), which is
    the difference between a ~1ms and a ~100ms gather on TPU.
    """
    q = packed_q.shape[0]
    m = cols.shape[1]
    rows = jnp.take(canon_bg_flat, cols, axis=0)         # (Q, M, L*W)
    codes = rows.reshape(q, m, L, w)
    x = codes ^ packed_q[:, None, None, :]
    d = jax.lax.population_count(x).astype(jnp.int32).sum(axis=-1)  # (Q,M,L)
    s_ids = jnp.arange(L, dtype=jnp.int32)[None, None, :]
    idx = s_ids * c_total + cols[:, :, None]
    key = d * stride + idx
    key = jnp.where(idx < valid_n, key, INT32_MAX)
    return key.reshape(q, m * L)


def _fused_rescan_kernel(rows_ref, qtile_ref, cols_ref, smat_ref, vn_ref,
                         out_ref, *, c_total, stride):
    """Fused rescan epilogue: one VMEM pass over the gathered winner rows.

    rows (Tq, M, L*W) u32 gathered column rows; qtile (Tq, L*W) u32 query
    words tiled L times (matches the rows' s-major/w-minor word order);
    cols (Tq, M, 1) i32 winner column ids (trailing singleton so each
    query's block slice is already the (M, 1) sublane vector the key
    compose broadcasts — Mosaic requires block lane dims divisible by 128
    or equal to the array dim, which rules out the transposed (M, Tq)
    layout the first cut used); smat (L*W, L) bf16 0/1 word-group sum
    matrix; vn (1, 1) i32 valid_n in SMEM. out (Tq, M, L) i32 composite
    keys.

    The word-group sum (per-item distance = sum of W per-word popcounts)
    runs on the MXU as pc @ smat instead of a strided cross-lane reduction:
    popcounts are <= 32 (bf16-exact) and sums <= bits <= 128 (f32-exact).
    The XLA path this replaces materializes the gather output, then streams
    it through separate xor/popcount/sum/compose passes; here everything
    after the gather is one read of the rows block."""
    tq, m, g = rows_ref.shape
    L = out_ref.shape[2]
    x = rows_ref[:] ^ qtile_ref[:][:, None, :]            # (Tq, M, G)
    pc = jax.lax.population_count(x).astype(jnp.int32)
    pcb = pc.astype(jnp.float32).astype(jnp.bfloat16)
    vn = vn_ref[0, 0]
    s_l = jax.lax.broadcasted_iota(jnp.int32, (m, L), 1)
    for i in range(tq):  # static unroll: 2D MXU dots (Mosaic-supported)
        d = jnp.dot(pcb[i], smat_ref[:],
                    preferred_element_type=jnp.float32)   # (M, L) exact
        di = d.astype(jnp.int32)
        col = cols_ref[i]                                 # (M, 1)
        idx = s_l * jnp.int32(c_total) + col
        key = di * jnp.int32(stride) + idx
        out_ref[i] = jnp.where(idx < vn, key, INT32_MAX)


@functools.partial(
    jax.jit,
    static_argnames=("L", "c_total", "w", "stride", "query_tile",
                     "interpret"),
)
def fused_rescan_keys(
    packed_q: jnp.ndarray,
    canon_bg_flat: jnp.ndarray,
    cols: jnp.ndarray,
    L: int,
    c_total: int,
    w: int,
    stride: int,
    valid_n,
    query_tile: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for _rescan_winner_columns: same (Q, M*L) int32
    composite keys (invalid -> INT32_MAX), but the post-gather arithmetic is
    a single fused Pallas pass (see _fused_rescan_kernel). The row gather
    itself stays an XLA take (lane-aligned 2KB-scale rows — the measured
    fast form); the kernel removes the materialize-then-stream traffic of
    the unfused epilogue."""
    q = packed_q.shape[0]
    m = cols.shape[1]
    g = L * w
    rows = jnp.take(canon_bg_flat, cols, axis=0)          # (Q, M, G)
    qtile = jnp.tile(packed_q, (1, L))                    # (Q, G)
    q_pad = pl.cdiv(q, query_tile) * query_tile
    if q_pad != q:
        rows = jnp.pad(rows, ((0, q_pad - q), (0, 0), (0, 0)))
        qtile = jnp.pad(qtile, ((0, q_pad - q), (0, 0)))
        cols = jnp.pad(cols, ((0, q_pad - q), (0, 0)))
    smat = (
        jax.lax.broadcasted_iota(jnp.int32, (g, L), 0) // w
        == jax.lax.broadcasted_iota(jnp.int32, (g, L), 1)
    ).astype(jnp.bfloat16)
    vn = jnp.asarray(valid_n, jnp.int32).reshape(1, 1)
    kernel = functools.partial(
        _fused_rescan_kernel, c_total=c_total, stride=stride
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((q_pad, m, L), jnp.int32),
        grid=(q_pad // query_tile,),
        in_specs=[
            pl.BlockSpec((query_tile, m, g), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, g), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, m, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((query_tile, m, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rows, qtile, cols[:, :, None].astype(jnp.int32), smat, vn)
    return out[:q].reshape(q, m * L)


def _full_column_keys(min1: jnp.ndarray, L: int, c: int, stride: int):
    """(Q, C) f32 group-min keys -> (Q, C) int32 DISTINCT full composite
    keys ``d*stride + (s*C + col)``. Distinctness (the global index is
    unique) is what makes the two-level min selections below tie-free.
    Padding columns (key >= PAD_PENALTY — the whole column was layout
    padding) map to INT32_MAX."""
    q, _ = min1.shape
    key_i = min1.astype(jnp.int32)
    is_pad = key_i >= jnp.int32(PAD_PENALTY)
    d = key_i // L
    s = key_i % L
    cols = jax.lax.broadcasted_iota(jnp.int32, (q, c), 1)
    full = d * stride + s * c + cols
    return jnp.where(is_pad, INT32_MAX, full)


def _twolevel_topk_min(keys: jnp.ndarray, kk: int, g: int = 16,
                       submins: jnp.ndarray | None = None):
    """Exact kk smallest of (Q, M) DISTINCT int32 keys via a subgroup level:
    any global top-kk key lives in a subgroup whose min is among the kk
    smallest subgroup minima (otherwise kk strictly smaller keys exist), so
    top-kk over M reduces to top-kk over M/g minima plus top-kk over the
    kk*g surviving candidates. Returns (keys (Q, kk), positions (Q, kk)
    int32 into M). Falls back to direct top_k when the reduction can't
    shrink the problem. ``submins``: optional precomputed (Q, M//g) minima.

    The candidate fetch MUST stay a whole-subgroup row gather
    (take_along_axis on the (Q, M/g, g) view — slice granularity g): an
    element-granular positional gather of the same kk*g candidates was
    measured at ~19 ms vs ~2 ms for this form at the 1M headline shape
    (round 4 — XLA TPU gathers serialize per element)."""
    q, m = keys.shape
    n_sub = m // g
    if n_sub < kk or m <= 4 * kk or m % g != 0 or kk * g >= m:
        # kk*g >= m: the "reduction" would re-select over >= m candidates —
        # strictly worse than one direct top_k (measured at the large-k
        # merge shapes, docs/BENCHMARKS.md round 3).
        negk, pos = jax.lax.top_k(-keys, kk)
        return -negk, pos
    sub = keys.reshape(q, n_sub, g)
    if submins is None:
        submins = sub.min(axis=2)
    _, sids = jax.lax.top_k(-submins, kk)                    # (Q, kk)
    cand = jnp.take_along_axis(sub, sids[:, :, None], axis=1)  # (Q, kk, g)
    negk, p = jax.lax.top_k(-cand.reshape(q, kk * g), kk)
    pos = jnp.take_along_axis(
        (sids[:, :, None] * g
         + jax.lax.broadcasted_iota(jnp.int32, (q, kk, g), 2)
         ).reshape(q, kk * g),
        p, axis=1,
    )
    return -negk, pos


@functools.partial(
    jax.jit,
    static_argnames=("k", "query_tile", "col_block", "interpret", "mode",
                     "recall_target", "scan_layout", "rescan_fused"),
)
def mxu_topk(
    packed_q: jnp.ndarray,
    gallery_g: jnp.ndarray,
    canon_bg_flat: jnp.ndarray,
    valid_n: jnp.ndarray | int,
    k: int = 100,
    query_tile: int = 128,
    col_block: int = 128,
    interpret: bool = False,
    mode: str = "exact",
    recall_target: float = 0.95,
    gallery_pm8: jnp.ndarray | None = None,
    scan_layout: str = "sublane",
    rescan_fused: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k via MXU scan (+ winner-column rescan when exact).

    mode="exact": oracle-bit-identical. Returns (dists (Q, kk), indices
    (Q, kk)); entries with index >= valid_n are padding sentinels
    (d > bits). No fallback path exists: the winner-rescan IS the exactness
    mechanism (see module doc), so latency is data-independent.

    mode="approx": group minima selected with lax.approx_min_k — skips the
    rescan and the exact sorts entirely. Recall = ApproxTopK recall x the
    group-collision term (an item hidden behind a same-group better item is
    missed; ~0.995 at k=100, C=8192 on uniform codes).

    gallery_pm8: optional (B, C//cb, L, cb) ±1 int8/bf16 copy of the
    gallery (grouped_to_pm8). When given, the scan skips the in-kernel
    unpack and feeds the MXU directly — identical results; see
    mxu8_groupmin_scan for when that wins (NOT on v5e, where it measured
    slower).
    """
    q, w = packed_q.shape
    _, L, c = gallery_g.shape
    n_total = L * c
    bits = 32 * w
    stride = n_total + 1
    # rescan composite keys share groupmin's int32 bound; the gallery
    # builder guards capacity (groupmin_capacity_ok) before choosing this
    # engine.
    assert (bits + 1) * stride + n_total < 2**31, "rescan key overflow"

    kk = min(k, n_total)
    m = min(kk, c)  # winner columns per query (capped by column count)

    if (mode == "exact" and gallery_pm8 is None):
        # Round-4 exact fast path: the kernel epilogue emits finished int32
        # full composite keys AND subgroup minima, so winner-column
        # selection is two narrow top_k calls + a gather — no elementwise
        # pass over the (Q, C) key array (_full_column_keys) remains.
        sub_g = 16
        kb = (build_key_base_t(L, c, bits, valid_n)
              if scan_layout == "lane"
              else build_key_base(L, c, bits, valid_n))
        full_min, submin = mxu_fullkey_scan(
            unpack_to_pm1(packed_q), gallery_g, kb,
            stride=stride, c_total=c, query_tile=query_tile,
            col_block=col_block, sub_g=sub_g, interpret=interpret,
            layout=scan_layout,
        )
        # Winner-column selection reuses the two-level rank-bound reduction
        # with the kernel-free subgroup minima (whole-subgroup row gather —
        # see _twolevel_topk_min's docstring for the measured gather trap).
        _, cols = _twolevel_topk_min(full_min, m, g=sub_g, submins=submin)
        if rescan_fused:
            rescan = fused_rescan_keys(
                packed_q, canon_bg_flat, cols, L, c, w, stride, valid_n,
                interpret=interpret,
            )
        else:
            rescan = _rescan_winner_columns(
                packed_q, canon_bg_flat, cols, L, c, w, stride, valid_n
            )
        final, _ = _twolevel_topk_min(rescan, kk)
        is_pad = final == INT32_MAX
        d = jnp.where(is_pad, bits + 1, final // stride)
        i = jnp.where(is_pad, n_total, final % stride)
        return d, i

    if gallery_pm8 is not None:
        if gallery_pm8.dtype == jnp.int8:
            qv = unpack_to_pm8(packed_q)
            kb = build_key_base_i32(L, c, bits, valid_n)
        else:
            qv = unpack_to_pm1(packed_q).astype(gallery_pm8.dtype)
            kb = build_key_base(L, c, bits, valid_n)
        min1 = mxu8_groupmin_scan(
            qv, gallery_pm8, kb,
            query_tile=query_tile, interpret=interpret,
        )
    else:
        q_pm1 = unpack_to_pm1(packed_q)
        key_base = build_key_base(L, c, bits, valid_n)
        min1 = mxu_groupmin_scan(
            q_pm1, gallery_g, key_base,
            query_tile=query_tile, col_block=col_block, interpret=interpret,
        )

    if mode == "approx":
        # approx_min_k wants floats; (d, s) keys are < 2^23 so the f32
        # round-trip is exact even coming from the int32 scan.
        vals, cols = jax.lax.approx_min_k(
            min1.astype(jnp.float32), m, recall_target=recall_target
        )
        key = vals.astype(jnp.int32)
        is_pad = key >= jnp.int32(PAD_PENALTY)
        d = jnp.where(is_pad, bits + 1, key // L)
        s = jnp.where(is_pad, 0, key % L)
        i = jnp.where(is_pad, n_total, s * c + cols)
        if m < kk:  # k exceeds the column count: pad with sentinels
            d = jnp.pad(d, ((0, 0), (0, kk - m)), constant_values=bits + 1)
            i = jnp.pad(i, ((0, 0), (0, kk - m)), constant_values=n_total)
        return d, i

    # Winner-column selection over DISTINCT full composite keys (the group
    # min's own key, reconstructed from (d, s) + column id): two-level
    # min-reduction replaces the lexicographic sorts — exact and tie-free
    # because keys are globally unique item keys.
    full_keys = _full_column_keys(min1, L, c, stride)
    _, cols = _twolevel_topk_min(full_keys, m)
    rescan = _rescan_winner_columns(
        packed_q, canon_bg_flat, cols, L, c, w, stride, valid_n
    )
    # Final merge by the same rank-bound argument one level down: every
    # global top-kk key lives in a subgroup (g consecutive rescan slots)
    # whose min is among the kk smallest subgroup minima — so two cheap
    # top_k calls (kk of m*L/g minima, then kk of kk*g candidates) replace
    # the per-group sorts + wide top_k of the previous design (measured
    # 14 ms -> ~2 ms at 1M x 1024q x k=100).
    final, _ = _twolevel_topk_min(rescan, kk)
    is_pad = final == INT32_MAX
    d = jnp.where(is_pad, bits + 1, final // stride)
    i = jnp.where(is_pad, n_total, final % stride)
    return d, i
