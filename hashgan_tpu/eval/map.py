"""Device-side streaming Hamming-ranking evaluation.

Reference parity (SURVEY.md §3.3/C16): the reference's MAP loop is host
numpy — ``Bq @ Bdb.T``, ``np.argsort`` per query, python AP loop. Here the
whole pipeline (distance scan -> exact-tie-break ranking -> AP reduction)
is one jitted function over packed uint32 codes; queries are processed in
static chunks so HBM holds only a (chunk, N) distance slab at a time.

Exactness: ranking uses the composite key ``dist * (N+1) + index`` so ties
break toward lower database index — bit-identical to the numpy oracle's
stable argsort (property-tested in tests/test_eval_device.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hashgan_tpu.ops.hamming import hamming_distance


def _pad_queries(packed_q, qlab, chunk):
    q = packed_q.shape[0]
    q_pad = ((q + chunk - 1) // chunk) * chunk
    if q_pad != q:
        packed_q = jnp.pad(packed_q, ((0, q_pad - q), (0, 0)))
        qlab = jnp.pad(qlab, ((0, q_pad - q), (0, 0)))
    return packed_q, qlab, q_pad


@functools.partial(
    jax.jit,
    static_argnames=("R", "query_chunk", "use_pallas", "interpret"),
)
def device_map_at_r(
    packed_q: jnp.ndarray,
    packed_g: jnp.ndarray,
    query_labels: jnp.ndarray,
    db_labels: jnp.ndarray,
    R: int = 1000,
    query_chunk: int = 256,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """MAP@R over packed codes. Returns a scalar f32.

    packed_q (Q, W) uint32; packed_g (N, W) uint32; labels 0/1 float.
    """
    q, w = packed_q.shape
    n = packed_g.shape[0]
    r_eff = min(R, n)
    stride = n + 1
    # Composite key must fit int32: maxd * (N+1) + N < 2^31. Holds for every
    # supported config (N <= 16M at 128 bits); assert statically.
    assert (32 * w + 1) * stride + n < 2**31, "gallery too large for int32 rank key"
    chunk = min(query_chunk, q)
    packed_q, qlab, q_pad = _pad_queries(packed_q, query_labels, chunk)

    iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, n), 1)
    ranks = jnp.arange(1, r_eff + 1, dtype=jnp.float32)[None, :]

    def one_chunk(args):
        pq, ql = args
        d = hamming_distance(pq, packed_g, use_pallas=use_pallas, interpret=interpret)
        key = d * jnp.int32(stride) + iota
        _, pos = jax.lax.top_k(-key, r_eff)
        rel = (ql @ db_labels.T) > 0
        hits = jnp.take_along_axis(rel, pos, axis=1).astype(jnp.float32)
        prec = jnp.cumsum(hits, axis=1) / ranks
        n_hits = hits.sum(axis=1)
        return jnp.where(
            n_hits > 0, (prec * hits).sum(axis=1) / jnp.maximum(n_hits, 1.0), 0.0
        )

    aps = jax.lax.map(
        one_chunk,
        (
            packed_q.reshape(q_pad // chunk, chunk, w),
            qlab.reshape(q_pad // chunk, chunk, -1),
        ),
    ).reshape(-1)
    valid = jnp.arange(q_pad) < q
    return jnp.where(valid, aps, 0.0).sum() / q


@functools.partial(
    jax.jit,
    static_argnames=("radius", "query_chunk", "use_pallas", "interpret"),
)
def device_precision_at_radius(
    packed_q: jnp.ndarray,
    packed_g: jnp.ndarray,
    query_labels: jnp.ndarray,
    db_labels: jnp.ndarray,
    radius: int = 2,
    query_chunk: int = 256,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Mean precision of retrievals within a Hamming radius (P@H<=r)."""
    q, w = packed_q.shape
    chunk = min(query_chunk, q)
    packed_q, qlab, q_pad = _pad_queries(packed_q, query_labels, chunk)

    def one_chunk(args):
        pq, ql = args
        d = hamming_distance(pq, packed_g, use_pallas=use_pallas, interpret=interpret)
        within = d <= radius
        rel = (ql @ db_labels.T) > 0
        retrieved = within.sum(axis=1)
        good = (within & rel).sum(axis=1)
        return jnp.where(retrieved > 0, good / jnp.maximum(retrieved, 1), 0.0)

    precs = jax.lax.map(
        one_chunk,
        (
            packed_q.reshape(q_pad // chunk, chunk, w),
            qlab.reshape(q_pad // chunk, chunk, -1),
        ),
    ).reshape(-1)
    valid = jnp.arange(q_pad) < q
    return jnp.where(valid, precs, 0.0).sum() / q
