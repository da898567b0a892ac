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

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from hashgan_tpu.ops.hamming import hamming_scan_topk

# jit-of-shard_map cache: shard_map builds a fresh traced callable per
# call, so jitting at the call site would miss the jit cache every time —
# and an UN-jitted shard_map dispatches eagerly, one remote op at a time
# (measured 20.6 s vs 37.6 ms for the same mesh=1 scan on the axon
# platform — docs/BENCHMARKS.md round 3). Each engine memoizes its jitted
# shard_map on the static config; jax.jit handles shape polymorphism
# within an entry. Mesh objects hash by device assignment + axis names.
# Keys embed gallery sizes, so a long-lived server whose gallery grows via
# extend/remove would otherwise accumulate one compiled entry per size —
# the cache is LRU-bounded to keep dead executables from piling up.
import collections as _collections

_SHARD_FN_CACHE: "_collections.OrderedDict" = _collections.OrderedDict()
_SHARD_FN_CACHE_MAX = 64


def _cached_shard_fn(key, build):
    fn = _SHARD_FN_CACHE.get(key)
    if fn is None:
        fn = jax.jit(build())
        _SHARD_FN_CACHE[key] = fn
        while len(_SHARD_FN_CACHE) > _SHARD_FN_CACHE_MAX:
            _SHARD_FN_CACHE.popitem(last=False)
    else:
        _SHARD_FN_CACHE.move_to_end(key)
    return fn


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
    max_d = 32 * packed_q.shape[1]
    if valid_n is None:
        valid_n = n

    def local_scan(q, g_local):  # noqa: C901 — one fused scan body
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
        # Position-based merge key: each shard's candidate list is already
        # (dist asc, idx asc) and shard r owns the contiguous global index
        # range [r*local_n, (r+1)*local_n), so for equal distance the
        # concatenated *position* orders exactly like the global index.
        # key = d * n_cand + position fits int32 for ANY gallery size
        # (d <= 129, n_cand = n_dev * k) — no global composite ceiling.
        n_cand = cat_d.shape[1]
        position = jax.lax.broadcasted_iota(jnp.int32, (q_n, n_cand), 1)
        sent = cat_d > max_d  # per-shard padding sentinels sort strictly last
        key = jnp.where(
            sent, jnp.iinfo(jnp.int32).max,
            cat_d * jnp.int32(n_cand) + position,
        )
        kk = min(k, n)
        _, pos = jax.lax.top_k(-key, kk)
        d_out = jnp.take_along_axis(cat_d, pos, axis=1)
        i_out = jnp.take_along_axis(cat_i, pos, axis=1)
        # Shard-local sentinel ids (local_n + r*local_n) can alias valid ids
        # of the next shard: force the documented "index >= n" contract.
        i_out = jnp.where(d_out > max_d, n, i_out)
        return d_out, i_out

    fn = _cached_shard_fn(
        ("hamming", mesh, n, packed_q.shape[1], k, slab, axis, use_pallas,
         int(valid_n)),
        lambda: shard_map(
            local_scan,
            mesh=mesh,
            in_specs=(P(None, None), P(None, axis)),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        ),
    )
    return fn(packed_q, gallery_t)


def ring_hamming_topk(
    mesh: Mesh,
    packed_q: jnp.ndarray,
    gallery_t: jnp.ndarray,
    k: int = 100,
    slab: int = 1 << 17,
    axis: str = "data",
    use_pallas: bool | None = None,
    valid_n: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ring-rotation variant (SURVEY.md §5 long-context row): gallery shards
    stay RESIDENT while query blocks rotate the ring via ``ppermute`` —
    ring-attention topology with a Hamming payload.

    The default engine (sharded_hamming_topk) replicates queries and
    all_gathers k candidates per chip — the right trade when Q is small.
    This variant is for query batches too large to replicate: queries are
    sharded over the mesh (Q divisible by mesh size), and each step every
    chip scans the visiting block against its resident shard, accumulates
    the shard's top-k candidates into the slot indexed by the SHARD id
    (so candidate groups end up in shard-ascending order regardless of the
    visit order), then forwards (block, accumulators) to the next chip.
    After n_dev steps each block is home with every shard's candidates and
    merges them with the same position-composite key as the all_gather
    engine — so the result is BIT-IDENTICAL to sharded_hamming_topk and the
    single-chip scan (asserted in tests/test_ring_topk.py at mesh {1,2,8}).

    Per-step ICI traffic per chip: Q/n_dev query rows + the traveling
    accumulator (Q/n_dev * n_dev * k candidate pairs); total over the cycle
    ~ Q*(W + 2*n_dev*k) words vs the all_gather engine's Q*n_dev*k — the
    ring wins when Q is large and k small relative to the gallery, and
    keeps per-chip query memory at Q/n_dev instead of Q.

    Returns (dists (Q, kk), global indices (Q, kk)), replicated, in the
    original query order; index >= n marks padding sentinels."""
    n = gallery_t.shape[1]
    n_dev = mesh.shape[axis]
    q = packed_q.shape[0]
    assert n % n_dev == 0, f"gallery {n} not divisible by mesh size {n_dev}"
    assert q % n_dev == 0, f"queries {q} not divisible by mesh size {n_dev}"
    local_n = n // n_dev
    max_d = 32 * packed_q.shape[1]
    if valid_n is None:
        valid_n = n
    kk_loc = min(k, local_n)
    kk = min(k, n)

    def ring(q_block, g_local):
        # q_block: (Q/n_dev, W) this chip's originating block;
        # g_local: (W, local_n) resident shard.
        me = jax.lax.axis_index(axis)
        qb = q_block
        q_loc = q_block.shape[0]
        d_acc = jnp.full((q_loc, n_dev, kk_loc), max_d + 1, jnp.int32)
        i_acc = jnp.full((q_loc, n_dev, kk_loc), n, jnp.int32)
        perm = [(r, (r + 1) % n_dev) for r in range(n_dev)]

        def step(_t, carry):
            qb, d_acc, i_acc = carry
            local_valid = jnp.clip(valid_n - me * local_n, 0, local_n)
            d, i = hamming_scan_topk(
                qb, g_local, k=kk_loc, slab=slab, use_pallas=use_pallas,
                valid_n=local_valid,
            )
            i = i + me * local_n
            # Slot by shard id: groups end up shard-ascending at home.
            d_acc = jax.lax.dynamic_update_slice(
                d_acc, d[:, None, :].astype(jnp.int32), (0, me, 0))
            i_acc = jax.lax.dynamic_update_slice(
                i_acc, i[:, None, :].astype(jnp.int32), (0, me, 0))
            qb = jax.lax.ppermute(qb, axis, perm)
            d_acc = jax.lax.ppermute(d_acc, axis, perm)
            i_acc = jax.lax.ppermute(i_acc, axis, perm)
            return qb, d_acc, i_acc

        qb, d_acc, i_acc = jax.lax.fori_loop(
            0, n_dev, step, (qb, d_acc, i_acc))
        # After a full cycle the block (and its accumulators) are home.
        cat_d = d_acc.reshape(q_loc, n_dev * kk_loc)
        cat_i = i_acc.reshape(q_loc, n_dev * kk_loc)
        # Identical merge to sharded_hamming_topk: groups are in shard-
        # ascending order and shards own contiguous global-index ranges, so
        # the position composite orders exactly like the global index for
        # equal distances — no global key ceiling.
        n_cand = cat_d.shape[1]
        position = jax.lax.broadcasted_iota(jnp.int32, (q_loc, n_cand), 1)
        sent = cat_d > max_d
        key = jnp.where(
            sent, jnp.iinfo(jnp.int32).max,
            cat_d * jnp.int32(n_cand) + position,
        )
        _, pos = jax.lax.top_k(-key, kk)
        d_out = jnp.take_along_axis(cat_d, pos, axis=1)
        i_out = jnp.take_along_axis(cat_i, pos, axis=1)
        i_out = jnp.where(d_out > max_d, n, i_out)
        return d_out, i_out

    fn = _cached_shard_fn(
        ("ring", mesh, n, q, packed_q.shape[1], k, slab, axis, use_pallas,
         int(valid_n)),
        lambda: shard_map(
            ring,
            mesh=mesh,
            in_specs=(P(axis, None), P(None, axis)),
            out_specs=(P(axis, None), P(axis, None)),
            check_vma=False,
        ),
    )
    return fn(packed_q, gallery_t)


# ----------------------------------------------------------------------------
# Sharded group-min engine (the fast exact path, multi-chip)
# ----------------------------------------------------------------------------

def shard_grouped_gallery(
    mesh: Mesh,
    packed: "np.ndarray",
    axis: str = "data",
    groups: int = 128,
    col_multiple: int = 256,
):
    """(N, W) canonical codes -> per-shard grouped layouts + canonicals.

    Each shard owns a contiguous slice of items (so local index order ==
    global index order within the shard — tie-breaks stay exact). Returns
    (grouped (nd, W, L, C_loc), canon (nd, n_loc, W), valids (nd,),
    canon_bg (nd, C_loc, L*W), n_loc), all device_put sharded on their
    leading axis. ``canon_bg`` is the group-major rescan layout for the
    MXU engine (ops/mxu_scan.py).
    """
    import numpy as np
    from jax.sharding import NamedSharding

    from hashgan_tpu.ops.groupmin import to_grouped_layout
    from hashgan_tpu.ops.mxu_scan import to_group_major

    nd = mesh.shape[axis]
    n, w = packed.shape
    unit = groups * col_multiple
    n_loc = max(1, -(-n // (nd * unit))) * unit
    total = n_loc * nd
    if total != n:
        packed = np.concatenate(
            [packed, np.zeros((total - n, w), dtype=np.uint32)], axis=0
        )
    slices = packed.reshape(nd, n_loc, w)
    grouped = np.stack(
        [to_grouped_layout(slices[r], groups, col_multiple) for r in range(nd)]
    )
    bg = np.stack([
        to_group_major(slices[r], groups, col_multiple).reshape(
            n_loc // groups, groups * w
        )
        for r in range(nd)
    ])
    valids = np.clip(n - np.arange(nd) * n_loc, 0, n_loc).astype(np.int32)
    sh = lambda spec: NamedSharding(mesh, spec)  # noqa: E731
    grouped_dev = jax.device_put(grouped, sh(P(axis, None, None, None)))
    canon_dev = jax.device_put(slices, sh(P(axis, None, None)))
    valids_dev = jax.device_put(valids, sh(P(axis)))
    bg_dev = jax.device_put(bg, sh(P(axis, None, None)))
    return grouped_dev, canon_dev, valids_dev, bg_dev, n_loc


def sharded_groupmin_topk(
    mesh: Mesh,
    packed_q: jnp.ndarray,
    grouped: jnp.ndarray,
    canon: jnp.ndarray,
    valids: jnp.ndarray,
    n: int,
    k: int = 100,
    repair: int = 16,
    axis: str = "data",
    query_tile: int = 32,
    col_block: int = 256,
    interpret: bool = False,
    exact: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Group-min exact top-k over a contiguously sharded gallery.

    Each chip scans its resident shard with the in-kernel group-min engine,
    then k candidates per chip ride ICI (all_gather) into an exact global
    merge on every chip. Returns (dists, global indices, fallback (Q,)):
    fallback marks queries needing the sort-based exact recompute (rare,
    see ops/groupmin.py).
    """
    from hashgan_tpu.ops.groupmin import groupmin_topk

    nd = mesh.shape[axis]
    n_loc = canon.shape[1]
    w = packed_q.shape[1]
    max_d = 32 * w
    kk = min(k, n_loc)

    def local(q, g, cn, v):
        g, cn, v = g[0], cn[0], v[0]
        d, i, fb = groupmin_topk(
            q, g, cn, v, k=kk, repair=repair, interpret=interpret,
            query_tile=query_tile, col_block=col_block, exact=exact,
        )
        r = jax.lax.axis_index(axis)
        dg = jax.lax.all_gather(d, axis)              # (nd, Q, kk)
        ig = jax.lax.all_gather(i + r * n_loc, axis)  # local -> global ids
        fbs = jax.lax.all_gather(fb, axis).any(axis=0)
        q_n = q.shape[0]
        cat_d = jnp.moveaxis(dg, 0, 1).reshape(q_n, -1)
        cat_i = jnp.moveaxis(ig, 0, 1).reshape(q_n, -1)
        # Position-based merge key (see sharded_hamming_topk): each shard's
        # list is (dist asc, idx asc) over a contiguous global index range,
        # so (d, position) orders exactly like (d, global idx) — and the key
        # fits int32 for ANY gallery size (no global composite ceiling).
        n_cand = cat_d.shape[1]
        position = jax.lax.broadcasted_iota(jnp.int32, (q_n, n_cand), 1)
        key = jnp.where(
            cat_d > max_d, jnp.iinfo(jnp.int32).max,
            cat_d * jnp.int32(n_cand) + position,
        )
        _, pos = jax.lax.top_k(-key, min(k, nd * kk))
        d_out = jnp.take_along_axis(cat_d, pos, axis=1)
        i_out = jnp.take_along_axis(cat_i, pos, axis=1)
        is_sentinel = d_out > max_d
        d_out = jnp.where(is_sentinel, max_d + 1, d_out)
        i_out = jnp.where(is_sentinel, n, i_out)
        return d_out, i_out, fbs

    fn = _cached_shard_fn(
        ("groupmin", mesh, n, n_loc, k, repair, axis, query_tile, col_block,
         interpret, exact, packed_q.shape[1]),
        lambda: shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, None), P(axis, None, None, None),
                      P(axis, None, None), P(axis)),
            out_specs=(P(None, None), P(None, None), P(None,)),
            check_vma=False,
        ),
    )
    return fn(packed_q, grouped, canon, valids)


def sharded_mxu_topk(
    mesh: Mesh,
    packed_q: jnp.ndarray,
    grouped: jnp.ndarray,
    canon_bg: jnp.ndarray,
    valids: jnp.ndarray,
    n: int,
    k: int = 100,
    axis: str = "data",
    query_tile: int = 128,
    col_block: int = 128,
    interpret: bool = False,
    mode: str = "exact",
    gallery_pm8: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MXU matmul-distance top-k over a contiguously sharded gallery.

    Each chip runs the single-chip MXU engine (ops/mxu_scan.py — exact via
    winner-column rescan, no fallback path) on its resident shard; k
    candidates per chip ride ICI (all_gather) into the position-key merge
    (exact for any gallery size, see sharded_hamming_topk). Returns
    (dists, global indices), replicated; index >= n marks padding.

    gallery_pm8: optional (nd, B, NB, L, cb) ±1 int8 shard stack
    (shard_pm8_gallery) — per-shard scans take the int8 MXU path.
    """
    from hashgan_tpu.ops.mxu_scan import mxu_topk

    nd = mesh.shape[axis]
    n_loc = grouped.shape[2] * grouped.shape[3]
    w = packed_q.shape[1]
    max_d = 32 * w
    kk = min(k, n_loc)

    def local(q, g, cbg, v, *pm8):
        g, cbg, v = g[0], cbg[0], v[0]
        d, i = mxu_topk(
            q, g, cbg, valid_n=v, k=kk, query_tile=query_tile,
            col_block=col_block, interpret=interpret, mode=mode,
            gallery_pm8=pm8[0][0] if pm8 else None,
        )
        r = jax.lax.axis_index(axis)
        dg = jax.lax.all_gather(d, axis)              # (nd, Q, kk)
        ig = jax.lax.all_gather(i + r * n_loc, axis)  # local -> global ids
        q_n = q.shape[0]
        cat_d = jnp.moveaxis(dg, 0, 1).reshape(q_n, -1)
        cat_i = jnp.moveaxis(ig, 0, 1).reshape(q_n, -1)
        n_cand = cat_d.shape[1]
        position = jax.lax.broadcasted_iota(jnp.int32, (q_n, n_cand), 1)
        key = jnp.where(
            cat_d > max_d, jnp.iinfo(jnp.int32).max,
            cat_d * jnp.int32(n_cand) + position,
        )
        _, pos = jax.lax.top_k(-key, min(k, nd * kk))
        d_out = jnp.take_along_axis(cat_d, pos, axis=1)
        i_out = jnp.take_along_axis(cat_i, pos, axis=1)
        is_sentinel = d_out > max_d
        d_out = jnp.where(is_sentinel, max_d + 1, d_out)
        i_out = jnp.where(is_sentinel, n, i_out)
        return d_out, i_out

    in_specs = [P(None, None), P(axis, None, None, None),
                P(axis, None, None), P(axis)]
    args = [packed_q, grouped, canon_bg, valids]
    if gallery_pm8 is not None:
        in_specs.append(P(axis, None, None, None, None))
        args.append(gallery_pm8)
    fn = _cached_shard_fn(
        ("mxu", mesh, n, n_loc, k, axis, query_tile, col_block, interpret,
         mode, gallery_pm8 is not None, packed_q.shape[1]),
        lambda: shard_map(
            local,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        ),
    )
    return fn(*args)


def shard_pm8_gallery(
    mesh: Mesh,
    grouped_dev: jnp.ndarray,
    axis: str = "data",
    col_block: int = 128,
) -> jnp.ndarray:
    """(nd, W, L, C_loc) sharded grouped gallery -> (nd, B, NB, L, cb) ±1
    int8 shard stack for the sharded int8 scan, built device-side per shard
    (no host round-trip)."""
    import functools as _ft

    from jax.sharding import NamedSharding

    from hashgan_tpu.ops.mxu_scan import grouped_to_pm8

    f = jax.vmap(_ft.partial(grouped_to_pm8, col_block=col_block))
    return jax.jit(
        f,
        out_shardings=NamedSharding(mesh, P(axis, None, None, None, None)),
    )(grouped_dev)


def sharded_mxu_topk_large(
    mesh: Mesh,
    packed_q: jnp.ndarray,
    grouped: jnp.ndarray,
    canon_bg: jnp.ndarray,
    valids: jnp.ndarray,
    n: int,
    k: int = 1000,
    axis: str = "data",
    sigma: int = 16,
    query_tile: int = 128,
    col_block: int = 128,
    interpret: bool = False,
    mode: str = "exact",
    select: str = "sortdecode",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact large-k (k in the thousands) over a contiguously sharded
    gallery: per-shard subgroup-min engine (ops/mxu_large_k.py), k
    candidates per chip over ICI, position-key merge (exact for any
    gallery size). The merge selects with lax.top_k by default — measured
    on v5e (docs/BENCHMARKS.md round 3) the counting select's compaction
    step (scatter / searchsorted) is 5-14x SLOWER than top_k at these
    widths, so ``select="radix"`` stays only as the documented negative
    result. Sentinels get distinct above-any-valid position keys so the
    radix path's count stays exact."""
    from hashgan_tpu.ops.mxu_large_k import (
        _compact_masked, count_select_threshold, mxu_topk_large,
    )

    nd = mesh.shape[axis]
    n_loc = grouped.shape[2] * grouped.shape[3]
    w = packed_q.shape[1]
    max_d = 32 * w
    kk = min(k, n_loc)
    k_out = min(k, nd * kk)

    def local(q, g, cbg, v):
        g, cbg, v = g[0], cbg[0], v[0]
        d, i = mxu_topk_large(
            q, g, cbg, valid_n=v, k=kk, sigma=sigma, query_tile=query_tile,
            col_block=col_block, interpret=interpret, mode=mode,
            select=select,
        )
        r = jax.lax.axis_index(axis)
        dg = jax.lax.all_gather(d, axis)              # (nd, Q, kk)
        ig = jax.lax.all_gather(i + r * n_loc, axis)  # local -> global ids
        q_n = q.shape[0]
        cat_d = jnp.moveaxis(dg, 0, 1).reshape(q_n, -1)
        cat_i = jnp.moveaxis(ig, 0, 1).reshape(q_n, -1)
        n_cand = cat_d.shape[1]
        position = jax.lax.broadcasted_iota(jnp.int32, (q_n, n_cand), 1)
        # sentinel key stays DISTINCT (not a shared INT32_MAX): the counting
        # select needs exactly-k mass at the threshold.
        key = (jnp.minimum(cat_d, max_d + 1) * jnp.int32(n_cand) + position)
        if mode == "exact" and select == "radix":
            hi = (max_d + 2) * n_cand
            tau = count_select_threshold(key, k_out, hi)
            packed_keys = _compact_masked(key, key <= tau[:, None], k_out)
            merged = jnp.sort(packed_keys, axis=1)
            pos = merged % jnp.int32(n_cand)
        elif mode == "exact" and select == "sortdecode":
            # (d, position) merge keys are distinct + self-identifying:
            # value-only sort, decode the candidate position arithmetically.
            merged = jax.lax.sort(key, dimension=1, is_stable=False)[:, :k_out]
            pos = merged % jnp.int32(n_cand)
        else:
            _, pos = jax.lax.top_k(-key, k_out)
        d_out = jnp.take_along_axis(cat_d, pos, axis=1)
        i_out = jnp.take_along_axis(cat_i, pos, axis=1)
        is_sentinel = d_out > max_d
        d_out = jnp.where(is_sentinel, max_d + 1, d_out)
        i_out = jnp.where(is_sentinel, n, i_out)
        return d_out, i_out

    fn = _cached_shard_fn(
        ("mxu_large", mesh, n, n_loc, k, axis, sigma, query_tile, col_block,
         interpret, mode, select, packed_q.shape[1]),
        lambda: shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, None), P(axis, None, None, None),
                      P(axis, None, None), P(axis)),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        ),
    )
    return fn(packed_q, grouped, canon_bg, valids)
