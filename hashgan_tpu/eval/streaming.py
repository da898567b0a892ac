"""Sort-free streaming evaluation from distance histograms.

For b-bit codes, Hamming distances are integers in [0, b] — so per-query
(total, relevant) counts at each distance value are sufficient statistics
for ranking metrics. This evaluator never sorts and never materializes a
ranking, so it scales to arbitrarily large galleries (the histogram pass is
a streaming slab scan like the top-k engine).

Contracts (each with a numpy oracle; tested in tests/test_streaming_eval.py):

- MAP: **tie-aware expected AP** — the expectation of AP@R over a uniformly
  random ordering within each distance tie bin, computed in closed form via
  digamma sums (exact expectation by hypergeometric exchangeability;
  normalized by expected hits — a ratio of expectations). The reference's
  argsort evaluator breaks ties by database index, which for i.i.d.-ordered
  databases is one random draw from this distribution; the exact evaluator
  (eval/map.py) remains the parity tool, this is the at-scale tool.
- P@H<=r and PR curves over Hamming radii are EXACT (no ties across the
  decision boundary by construction).

Closed form per bin (n items, r relevant, N0/R0 cumulative counts before the
bin, m = positions of the bin inside the top-R cutoff):
  S1 = sum_{i=1..m} 1/(N0+i)            = psi(N0+m+1) - psi(N0+1)
  S2 = sum_{i=1..m} (i-1)/(N0+i)        = m - (N0+1) * S1
  E[sum prec@hit] += (r/n) * [(R0+1) * S1 + (r-1)/(n-1) * S2]
  E[hits]         += m * r / n
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------------------
# Histogram computation
# ----------------------------------------------------------------------------

def distance_histograms_np(
    dist: np.ndarray, rel: np.ndarray, max_d: int
) -> Tuple[np.ndarray, np.ndarray]:
    """(Q, N) int distances, (Q, N) bool relevance -> (Q, max_d+1) counts."""
    q = dist.shape[0]
    n_hist = np.zeros((q, max_d + 1), dtype=np.int64)
    r_hist = np.zeros((q, max_d + 1), dtype=np.int64)
    for i in range(q):
        n_hist[i] = np.bincount(dist[i], minlength=max_d + 1)
        r_hist[i] = np.bincount(dist[i], weights=rel[i].astype(np.float64),
                                minlength=max_d + 1).astype(np.int64)
    return n_hist, r_hist


@functools.partial(jax.jit, static_argnames=("slab", "use_pallas", "interpret"))
def device_distance_histograms(
    packed_q: jnp.ndarray,
    gallery_t: jnp.ndarray,
    query_labels: jnp.ndarray,
    db_labels: jnp.ndarray,
    slab: int = 1 << 15,
    use_pallas: bool | None = None,
    interpret: bool = False,
    valid_n: jnp.ndarray | int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming (Q, b+1) histograms of (total, relevant) per distance.

    db_labels: (N, K). The gallery tail may be padded; pass labels only for
    real entries is not possible under static shapes, so db_labels must
    cover gallery_t's N (pad labels with zeros: padding is never relevant,
    and its distance-bin pollution is avoided by the ``valid_n`` index mask —
    defaults to gallery width; may be traced, e.g. a shard's local count)."""
    from hashgan_tpu.ops.hamming import _hamming_pallas, hamming_distance_jnp

    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    q, w = packed_q.shape
    n = gallery_t.shape[1]
    if valid_n is None:
        valid_n = n
    max_d = 32 * w
    n_slabs = -(-n // slab)
    n_pad = n_slabs * slab
    if n_pad != n:
        gallery_t = jnp.pad(gallery_t, ((0, 0), (0, n_pad - n)))
        db_labels = jnp.pad(db_labels, ((0, n_pad - n), (0, 0)))
    slabs = gallery_t.reshape(w, n_slabs, slab).transpose(1, 0, 2)
    lab_slabs = db_labels.reshape(n_slabs, slab, -1)
    values = jnp.arange(max_d + 1, dtype=jnp.int32)

    def body(carry, inp):
        n_hist, r_hist = carry
        slab_idx, slab_g, slab_lab = inp
        if use_pallas or interpret:
            d = _hamming_pallas(packed_q, slab_g, interpret=interpret)
        else:
            d = hamming_distance_jnp(packed_q, slab_g.T)
        idx = slab_idx * slab + jax.lax.broadcasted_iota(jnp.int32, (q, slab), 1)
        valid = idx < valid_n
        rel = ((query_labels @ slab_lab.T) > 0) & valid

        def count_v(v):
            at_v = (d == v) & valid
            return at_v.sum(axis=1), (at_v & rel).sum(axis=1)

        nv, rv = jax.lax.map(count_v, values)  # (b+1, Q) each
        return (n_hist + nv.T, r_hist + rv.T), None

    init = (
        jnp.zeros((q, max_d + 1), jnp.int32),
        jnp.zeros((q, max_d + 1), jnp.int32),
    )
    (n_hist, r_hist), _ = jax.lax.scan(
        body, init,
        (jnp.arange(n_slabs, dtype=jnp.int32), slabs, lab_slabs),
    )
    return n_hist, r_hist


# ----------------------------------------------------------------------------
# Tie-aware AP from histograms
# ----------------------------------------------------------------------------

def tie_aware_map_np(n_hist: np.ndarray, r_hist: np.ndarray, R: int) -> float:
    """Position-loop numpy oracle of the tie-aware expected MAP@R."""
    q = n_hist.shape[0]
    aps = []
    for qi in range(q):
        n0 = r0 = 0
        exp_prec_sum = 0.0
        exp_hits = 0.0
        for v in range(n_hist.shape[1]):
            n, r = int(n_hist[qi, v]), int(r_hist[qi, v])
            if n == 0:
                continue
            m = min(n, max(R - n0, 0))
            if m > 0:
                p_rel = r / n
                c = (r - 1) / (n - 1) if n > 1 else 0.0
                for i in range(1, m + 1):
                    exp_prec_sum += p_rel * (r0 + 1 + (i - 1) * c) / (n0 + i)
                exp_hits += m * p_rel
            n0 += n
            r0 += r
        aps.append(exp_prec_sum / exp_hits if exp_hits > 0 else 0.0)
    return float(np.mean(aps))


@functools.partial(jax.jit, static_argnames=("R",))
def tie_aware_map(n_hist: jnp.ndarray, r_hist: jnp.ndarray, R: int) -> jnp.ndarray:
    """Closed-form (digamma) tie-aware expected MAP@R. (Q, B+1) -> scalar."""
    from jax.scipy.special import digamma

    n = n_hist.astype(jnp.float32)
    r = r_hist.astype(jnp.float32)
    n0 = jnp.cumsum(n, axis=1) - n          # items before bin
    r0 = jnp.cumsum(r, axis=1) - r          # relevant before bin
    m = jnp.clip(jnp.float32(R) - n0, 0.0, None)
    m = jnp.minimum(m, n)                    # positions inside cutoff
    s1 = digamma(n0 + m + 1.0) - digamma(n0 + 1.0)
    s2 = m - (n0 + 1.0) * s1
    p_rel = jnp.where(n > 0, r / jnp.maximum(n, 1.0), 0.0)
    c = jnp.where(n > 1, (r - 1.0) / jnp.maximum(n - 1.0, 1.0), 0.0)
    prec_sum = (p_rel * ((r0 + 1.0) * s1 + c * s2)).sum(axis=1)
    hits = (m * p_rel).sum(axis=1)
    ap = jnp.where(hits > 0, prec_sum / jnp.maximum(hits, 1e-12), 0.0)
    return ap.mean()


# ----------------------------------------------------------------------------
# Exact radius metrics / PR curve from histograms
# ----------------------------------------------------------------------------

def precision_at_radius_from_hist(
    n_hist: jnp.ndarray, r_hist: jnp.ndarray, radius: int
) -> jnp.ndarray:
    n_cum = n_hist[:, : radius + 1].sum(axis=1).astype(jnp.float32)
    r_cum = r_hist[:, : radius + 1].sum(axis=1).astype(jnp.float32)
    return jnp.where(n_cum > 0, r_cum / jnp.maximum(n_cum, 1.0), 0.0).mean()


def pr_curve_from_hist(
    n_hist: np.ndarray, r_hist: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact PR curve over Hamming radii (mean across queries)."""
    n_cum = np.cumsum(np.asarray(n_hist, dtype=np.float64), axis=1)
    r_cum = np.cumsum(np.asarray(r_hist, dtype=np.float64), axis=1)
    total_rel = np.maximum(r_cum[:, -1:], 1.0)
    precision = np.where(n_cum > 0, r_cum / np.maximum(n_cum, 1.0), 0.0)
    recall = r_cum / total_rel
    return precision.mean(axis=0), recall.mean(axis=0)


def precision_at_topn_from_hist(
    n_hist: np.ndarray, r_hist: np.ndarray, topns: np.ndarray
) -> np.ndarray:
    """Expected precision@N over the Hamming ranking, per returned-count N
    (the reference evaluator family's precision-vs-top-N curve, SURVEY.md
    C16 — expected ``util.py::MAPs`` — alongside P-R over radii).

    Tie-aware like tie_aware_map: within a distance bin the expected number
    of relevant items among the bin's first m ranked positions is m * r/n
    (hypergeometric mean), so E[relevant in top N] = sum over bins of
    min(n, max(N - n0, 0)) * r/n. Precision divides by the number actually
    returned (min(N, gallery size)). Mean across queries.

    topns: 1-D int array of cutoffs; returns same-shape float array."""
    n = np.asarray(n_hist, dtype=np.float64)
    r = np.asarray(r_hist, dtype=np.float64)
    n0 = np.cumsum(n, axis=1) - n                        # (Q, B+1)
    p_rel = np.where(n > 0, r / np.maximum(n, 1.0), 0.0)
    total = n.sum(axis=1, keepdims=True)                 # (Q, 1)
    topns = np.asarray(topns, dtype=np.int64)
    # (Q, B+1, T) broadcast: positions of each bin inside each cutoff.
    m = np.clip(topns[None, None, :] - n0[:, :, None], 0.0, n[:, :, None])
    exp_rel = (m * p_rel[:, :, None]).sum(axis=1)        # (Q, T)
    returned = np.minimum(topns[None, :], np.maximum(total, 1.0))
    return (exp_rel / returned).mean(axis=0)


def precision_at_topn_np(
    dist: np.ndarray, rel: np.ndarray, topns: np.ndarray
) -> np.ndarray:
    """Position-loop oracle of precision_at_topn_from_hist: for each query,
    walk the distance-sorted gallery and count expected relevant items in
    the top N, spreading each tie bin's relevants uniformly."""
    q, n_items = dist.shape
    topns = np.asarray(topns, dtype=np.int64)
    out = np.zeros((q, len(topns)))
    for qi in range(q):
        order = np.argsort(dist[qi], kind="stable")
        d_sorted = dist[qi][order]
        rel_sorted = rel[qi][order].astype(np.float64)
        # expected per-position relevance: uniform within each tie bin
        exp_pos = np.empty(n_items)
        lo = 0
        while lo < n_items:
            hi = lo
            while hi < n_items and d_sorted[hi] == d_sorted[lo]:
                hi += 1
            exp_pos[lo:hi] = rel_sorted[lo:hi].mean()
            lo = hi
        cum = np.cumsum(exp_pos)
        for ti, N in enumerate(topns):
            k = min(int(N), n_items)
            out[qi, ti] = cum[k - 1] / min(int(N), n_items) if k > 0 else 0.0
    return out.mean(axis=0)
