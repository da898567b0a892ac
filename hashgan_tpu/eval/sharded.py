"""Mesh-sharded Hamming-ranking evaluation.

Reference parity (SURVEY.md §3.3/C16): the reference evaluates on one host in
numpy. Single-device the rebuild uses eval/map.py; at mesh scale the gallery
is sharded over the ``data`` axis and evaluated in place:

- MAP@R: each chip scans its resident gallery shard, the exact composite-key
  top-R merge (parallel/sharded_scan.py) reproduces the single-device ranked
  list bit-for-bit, and AP is computed from the merged list's label gathers —
  so ``sharded_map_at_r == device_map_at_r`` exactly (tested).
- Distance histograms (the sufficient statistics for the streaming tie-aware
  evaluator, eval/streaming.py): per-shard histograms + one ``psum`` over ICI.

Queries and labels are replicated (KBs); only the gallery is sharded — the
communication per query is R candidates (MAP) or b+1 counters (histograms).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from hashgan_tpu.parallel.sharded_scan import sharded_hamming_topk


def shard_gallery_for_eval(
    mesh: Mesh,
    packed_g: np.ndarray,
    db_labels: np.ndarray,
    axis: str = "data",
) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """(N, W) canonical packed codes + (N, K) labels -> sharded
    (gallery_t (W, N_pad), labels (N_pad, K), valid_n). Padding codes are
    zero words with zero labels (never relevant, masked by valid_n)."""
    n, w = packed_g.shape
    nd = mesh.shape[axis]
    n_pad = ((n + nd - 1) // nd) * nd
    if n_pad != n:
        packed_g = np.concatenate(
            [packed_g, np.zeros((n_pad - n, w), dtype=packed_g.dtype)], axis=0
        )
        db_labels = np.concatenate(
            [db_labels, np.zeros((n_pad - n,) + db_labels.shape[1:],
                                 dtype=db_labels.dtype)],
            axis=0,
        )
    gallery_t = jax.device_put(
        jnp.asarray(packed_g.T), NamedSharding(mesh, P(None, axis))
    )
    labels = jax.device_put(
        jnp.asarray(db_labels), NamedSharding(mesh, P(axis, None))
    )
    return gallery_t, labels, n


def sharded_map_at_r(
    mesh: Mesh,
    packed_q: jnp.ndarray,
    gallery_t: jnp.ndarray,
    query_labels: jnp.ndarray,
    db_labels: jnp.ndarray,
    R: int = 1000,
    valid_n: int | None = None,
    axis: str = "data",
    slab: int = 1 << 17,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """MAP@R over a mesh-sharded gallery; bit-equal to device_map_at_r.

    ``db_labels`` must cover gallery_t's (padded) N; ``valid_n`` is the true
    item count. The ranked top-R list comes from the exact sharded merge, so
    tie order (distance asc, database index asc) matches the numpy oracle.
    """
    n_padded = gallery_t.shape[1]
    if valid_n is None:
        valid_n = n_padded
    r_eff = min(R, valid_n)
    max_d = 32 * packed_q.shape[1]
    d, i = sharded_hamming_topk(
        mesh, packed_q, gallery_t, k=r_eff, slab=slab, axis=axis,
        use_pallas=use_pallas, valid_n=valid_n,
    )
    # Label gather on the replicated candidate list; sentinel entries
    # (padding, d > max_d) are never hits.
    i_safe = jnp.clip(i, 0, db_labels.shape[0] - 1)
    cand_rel = jnp.einsum(
        "qk,qrk->qr", query_labels, db_labels[i_safe]
    ) > 0
    valid = (d <= max_d) & (i < valid_n)
    hits = (cand_rel & valid).astype(jnp.float32)
    ranks = jnp.arange(1, r_eff + 1, dtype=jnp.float32)[None, :]
    prec = jnp.cumsum(hits, axis=1) / ranks
    n_hits = hits.sum(axis=1)
    ap = jnp.where(
        n_hits > 0, (prec * hits).sum(axis=1) / jnp.maximum(n_hits, 1.0), 0.0
    )
    return ap.mean()


def sharded_precision_at_radius(
    mesh: Mesh,
    packed_q: jnp.ndarray,
    gallery_t: jnp.ndarray,
    query_labels: jnp.ndarray,
    db_labels: jnp.ndarray,
    radius: int = 2,
    valid_n: int | None = None,
    axis: str = "data",
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """P@H<=r via sharded histograms (exact: radius metrics have no ties
    across the decision boundary)."""
    from hashgan_tpu.eval.streaming import precision_at_radius_from_hist

    n_hist, r_hist = sharded_distance_histograms(
        mesh, packed_q, gallery_t, query_labels, db_labels,
        valid_n=valid_n, axis=axis, use_pallas=use_pallas,
    )
    return precision_at_radius_from_hist(n_hist, r_hist, radius)


def sharded_distance_histograms(
    mesh: Mesh,
    packed_q: jnp.ndarray,
    gallery_t: jnp.ndarray,
    query_labels: jnp.ndarray,
    db_labels: jnp.ndarray,
    valid_n: int | None = None,
    axis: str = "data",
    slab: int = 1 << 15,
    use_pallas: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-query (total, relevant) distance histograms over a sharded gallery.

    Each chip histograms its resident shard (streaming slab scan), then one
    ``psum`` over ICI merges the counters — histogram addition is exact, so
    the result equals the single-device histograms on the same codes.
    """
    from hashgan_tpu.eval.streaming import device_distance_histograms

    n_padded = gallery_t.shape[1]
    nd = mesh.shape[axis]
    assert n_padded % nd == 0, "pad the gallery to a mesh multiple first"
    local_n = n_padded // nd
    if valid_n is None:
        valid_n = n_padded

    def local(q, ql, g_local, lab_local):
        shard_idx = jax.lax.axis_index(axis)
        local_valid = jnp.clip(valid_n - shard_idx * local_n, 0, local_n)
        n_h, r_h = device_distance_histograms(
            q, g_local, ql, lab_local, slab=slab, use_pallas=use_pallas,
            valid_n=local_valid,
        )
        return (
            jax.lax.psum(n_h, axis),
            jax.lax.psum(r_h, axis),
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, None), P(None, None), P(None, axis), P(axis, None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return fn(packed_q, query_labels, gallery_t, db_labels)
