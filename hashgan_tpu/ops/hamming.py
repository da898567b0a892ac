"""XOR-popcount Hamming scan over a packed gallery, with top-k.

This is the rebuild's query engine: the reference ranks with a host numpy
``Bq @ Bdb.T`` + argsort (SURVEY.md §3.3, C16); here the scan runs on the
TPU VPU over uint32-packed codes.

Design (see SURVEY.md §7 phase 2):

- Gallery is stored **transposed** as (W, N) uint32 ("scan layout"): the
  kernel then reads word w of a gallery block as a (1, Tn) lane vector and
  XORs it against the (Tq, 1) query word column — a pure broadcast on the
  VPU, no in-kernel transpose.
- Per (query-tile, gallery-block) cell the kernel accumulates
  sum_w popcount(xor) into an int32 (Tq, Tn) distance tile. W is static
  (<= 4 for 128-bit codes) so the word loop fully unrolls.
- Top-k over huge galleries: the distance matrix is produced slab-by-slab
  and merged into a running (dist, index) top-k via ``lax.top_k`` — ties
  break toward lower database index, matching the numpy oracle's stable
  argsort.  (On-chip top-k inside the kernel is a later optimization; the
  scan itself, not the merge, is the throughput term.)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ----------------------------------------------------------------------------
# jnp reference path (any backend; used by tests and CPU fallback)
# ----------------------------------------------------------------------------

def hamming_distance_jnp(packed_q: jnp.ndarray, packed_g: jnp.ndarray) -> jnp.ndarray:
    """(Q, W) x (N, W) -> (Q, N) int32 all-pairs Hamming distance."""
    x = packed_q[:, None, :] ^ packed_g[None, :, :]
    return jax.lax.population_count(x).astype(jnp.int32).sum(axis=-1)


# ----------------------------------------------------------------------------
# Pallas kernel
# ----------------------------------------------------------------------------

def _hamming_kernel(q_ref, gt_ref, out_ref):
    """q_ref: (Tq, W) uint32; gt_ref: (W, Tn) uint32; out_ref: (Tq, Tn) int32."""
    w_words = q_ref.shape[1]
    dist = None
    for w in range(w_words):  # static unroll, W <= 4
        x = q_ref[:, w][:, None] ^ gt_ref[w, :][None, :]
        p = jax.lax.population_count(x).astype(jnp.int32)
        dist = p if dist is None else dist + p
    out_ref[:] = dist


@functools.partial(
    jax.jit, static_argnames=("query_tile", "gallery_tile", "interpret")
)
def _hamming_pallas(
    packed_q: jnp.ndarray,
    gallery_t: jnp.ndarray,
    query_tile: int = 128,
    gallery_tile: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """(Q, W) x (W, N) -> (Q, N) int32. Q, N are padded to tile multiples."""
    q, w = packed_q.shape
    n = gallery_t.shape[1]
    q_pad = pl.cdiv(q, query_tile) * query_tile
    n_pad = pl.cdiv(n, gallery_tile) * gallery_tile
    if q_pad != q:
        packed_q = jnp.pad(packed_q, ((0, q_pad - q), (0, 0)))
    if n_pad != n:
        gallery_t = jnp.pad(gallery_t, ((0, 0), (0, n_pad - n)))
    out = pl.pallas_call(
        _hamming_kernel,
        out_shape=jax.ShapeDtypeStruct((q_pad, n_pad), jnp.int32),
        grid=(q_pad // query_tile, n_pad // gallery_tile),
        in_specs=[
            pl.BlockSpec((query_tile, w), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, gallery_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (query_tile, gallery_tile), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(packed_q, gallery_t)
    return out[:q, :n]


def hamming_distance(
    packed_q: jnp.ndarray,
    packed_g: jnp.ndarray,
    use_pallas: bool | None = None,
    interpret: bool = False,
    query_tile: int = 128,
    gallery_tile: int = 2048,
) -> jnp.ndarray:
    """All-pairs distance. ``packed_g`` is canonical (N, W) layout."""
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas or interpret:
        return _hamming_pallas(
            packed_q,
            packed_g.T,
            query_tile=query_tile,
            gallery_tile=gallery_tile,
            interpret=interpret,
        )
    return hamming_distance_jnp(packed_q, packed_g)


# ----------------------------------------------------------------------------
# Top-k scan over a slabbed gallery
# ----------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("k", "slab", "use_pallas", "interpret", "mode",
                     "recall_target", "_force_plain_tiebreak"),
)
def hamming_scan_topk(
    packed_q: jnp.ndarray,
    gallery_t: jnp.ndarray,
    k: int = 100,
    slab: int = 1 << 17,
    use_pallas: bool | None = None,
    interpret: bool = False,
    valid_n: jnp.ndarray | int | None = None,
    mode: str = "exact",
    recall_target: float = 0.95,
    _force_plain_tiebreak: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming top-k: (Q, W) queries vs (W, N) scan-layout gallery.

    Returns (dists (Q, k) int32 ascending, indices (Q, k) int32).

    mode="exact" (default): ties break toward lower database index — matches
    the numpy oracle bit-for-bit. The merge is ``lax.top_k`` (sort-based).

    mode="approx": per-slab selection uses ``lax.approx_min_k`` — XLA's
    ApproxTopK/PartialReduce op, built for TPU KNN serving — ~20x faster
    merge at ~(recall_target..0.999) recall of the true top-k (every
    comparison is still computed exactly; only selection may drop a
    near-duplicate candidate). Use for serving; use exact for evaluation.

    ``valid_n`` (traced ok) marks gallery entries >= valid_n as padding:
    they get a sentinel distance (> any real distance) so they sort strictly
    last and can never displace a real entry.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    q, w = packed_q.shape
    n = gallery_t.shape[1]
    if valid_n is None:
        valid_n = n
    max_d = 32 * w          # largest possible real distance
    sentinel = max_d + 1    # strictly worse than any real distance
    slab = min(slab, n)
    n_slabs = pl.cdiv(n, slab)
    n_pad = n_slabs * slab
    if n_pad != n:
        gallery_t = jnp.pad(gallery_t, ((0, 0), (0, n_pad - n)))
    slabs = gallery_t.reshape(w, n_slabs, slab).transpose(1, 0, 2)  # (S, W, slab)

    # Composite int32 key (distance-major, index-minor) gives exact
    # lowest-index tie-breaking when it fits; beyond that (N > ~16M at 128
    # bits) fall back to plain distance top_k, which XLA ties by position —
    # STILL exact index order: the carried best list is inductively
    # (dist asc, idx asc), every new slab's candidates have strictly larger
    # indices than all previous real entries (slabs scan in index order) and
    # are themselves iota-ordered, and sentinels sort last by distance. So
    # position order == index order at every merge, and the engine has no
    # gallery-size ceiling (tested via _force_plain_tiebreak).
    stride = n_pad + 1
    use_key = (
        sentinel * stride + n_pad < jnp.iinfo(jnp.int32).max
        and not _force_plain_tiebreak
    )

    init_d = jnp.full((q, k), sentinel, dtype=jnp.int32)
    init_i = jnp.full((q, k), jnp.int32(n), dtype=jnp.int32)

    def body(carry, inp):
        best_d, best_i = carry
        slab_idx, slab_g = inp
        if use_pallas or interpret:
            d = _hamming_pallas(packed_q, slab_g, interpret=interpret)
        else:
            d = hamming_distance_jnp(packed_q, slab_g.T)
        idx = slab_idx * slab + jax.lax.broadcasted_iota(jnp.int32, (q, slab), 1)
        d = jnp.where(idx < valid_n, d, sentinel)  # neutralize padding
        if mode == "approx":
            # ApproxTopK wants floats; distances <= 129 are exact in f32.
            vals, pos_in_slab = jax.lax.approx_min_k(
                d.astype(jnp.float32), min(k, slab),
                recall_target=recall_target,
            )
            cand_d = vals.astype(jnp.int32)
            cand_i = jnp.take_along_axis(idx, pos_in_slab, axis=1)
            cat_d = jnp.concatenate([best_d, cand_d], axis=1)
            cat_i = jnp.concatenate([best_i, cand_i], axis=1)
        else:
            cat_d = jnp.concatenate([best_d, d], axis=1)
            cat_i = jnp.concatenate([best_i, idx], axis=1)
        if use_key:
            key = cat_d * jnp.int32(stride) + cat_i
        else:
            key = cat_d
        _, pos = jax.lax.top_k(-key, k)
        best_d = jnp.take_along_axis(cat_d, pos, axis=1)
        best_i = jnp.take_along_axis(cat_i, pos, axis=1)
        return (best_d, best_i), None

    (best_d, best_i), _ = jax.lax.scan(
        body, (init_d, init_i), (jnp.arange(n_slabs, dtype=jnp.int32), slabs)
    )
    return best_d, best_i
