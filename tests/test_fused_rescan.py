"""Fused rescan epilogue kernel (ops/mxu_scan.fused_rescan_keys): bit-
identical to the XLA _rescan_winner_columns path, and the composed
mxu_topk(rescan_fused=True) stays oracle-bit-identical."""

import jax.numpy as jnp
import numpy as np
import pytest

from hashgan_tpu.ops import hamming_distance_np, pack_codes_np
from hashgan_tpu.ops.groupmin import to_grouped_layout
from hashgan_tpu.ops.mxu_scan import (
    _rescan_winner_columns,
    fused_rescan_keys,
    mxu_topk,
    to_group_major,
)


def _build(codes_pm1, groups=8, col_multiple=16):
    packed = pack_codes_np(codes_pm1)
    gg = to_grouped_layout(packed, groups=groups, col_multiple=col_multiple)
    bg = to_group_major(packed, groups=groups, col_multiple=col_multiple)
    c, L, w = bg.shape
    return packed, jnp.asarray(gg), jnp.asarray(bg.reshape(c, L * w))


@pytest.mark.parametrize(
    "bits,n,q,m,groups",
    [
        (32, 700, 9, 5, 8),      # w=1, odd q (query-pad path), small m
        (64, 1200, 16, 12, 8),   # w=2
        (128, 500, 7, 3, 8),     # w=4
        (64, 2100, 10, 20, 16),  # larger L, m > sublane granularity probe
    ],
)
def test_fused_rescan_matches_xla_path(bits, n, q, m, groups):
    rng = np.random.default_rng(bits * 7 + n + q)
    codes = np.where(
        rng.uniform(size=(n, bits)) < 0.5, -1.0, 1.0
    ).astype(np.float32)
    queries = np.where(
        rng.uniform(size=(q, bits)) < 0.5, -1.0, 1.0
    ).astype(np.float32)
    packed, _, bgf = _build(codes, groups=groups)
    c, lw = bgf.shape
    L = groups
    w = lw // L
    n_total = L * c
    stride = n_total + 1
    pq = jnp.asarray(pack_codes_np(queries))
    cols = jnp.asarray(
        rng.integers(0, c, size=(q, m), dtype=np.int32)
    )
    ref = np.asarray(
        _rescan_winner_columns(pq, bgf, cols, L, c, w, stride, n)
    )
    got = np.asarray(
        fused_rescan_keys(
            pq, bgf, cols, L, c, w, stride, n,
            query_tile=4, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_fused_rescan_padding_columns_all_invalid():
    """Columns made entirely of layout padding must emit INT32_MAX keys."""
    rng = np.random.default_rng(5)
    bits, n, q = 32, 40, 3  # n=40 < L*C with padding tail
    codes = np.where(
        rng.uniform(size=(n, bits)) < 0.5, -1.0, 1.0
    ).astype(np.float32)
    queries = np.where(
        rng.uniform(size=(q, bits)) < 0.5, -1.0, 1.0
    ).astype(np.float32)
    packed, _, bgf = _build(codes)  # groups=8, col_multiple=16 -> C=16
    c, lw = bgf.shape
    L, w = 8, lw // 8
    n_total = L * c
    stride = n_total + 1
    pq = jnp.asarray(pack_codes_np(queries))
    # col ids whose every item index s*c + col >= n: col >= n - (L-1)*c is
    # not a clean bound; instead pick the last column and rely on n=40 <
    # c=16*... — compute expected from the XLA path (already covered) and
    # additionally assert the invalid positions are INT32_MAX.
    cols = jnp.asarray(np.full((q, 2), c - 1, dtype=np.int32))
    got = np.asarray(
        fused_rescan_keys(
            pq, bgf, cols, L, c, w, stride, n,
            query_tile=4, interpret=True,
        )
    ).reshape(q, 2, L)
    s = np.arange(L)[None, None, :]
    idx = s * c + np.asarray(cols)[:, :, None]
    assert ((got == np.iinfo(np.int32).max) == (idx >= n)).all()


@pytest.mark.parametrize("bits,n,q,k", [(32, 700, 9, 20), (64, 1200, 5, 64)])
def test_mxu_topk_fused_matches_oracle(bits, n, q, k):
    rng = np.random.default_rng(bits + n + 1)
    codes = np.where(
        rng.uniform(size=(n, bits)) < 0.5, -1.0, 1.0
    ).astype(np.float32)
    queries = np.where(
        rng.uniform(size=(q, bits)) < 0.5, -1.0, 1.0
    ).astype(np.float32)
    packed, gg, bgf = _build(codes)
    pq = jnp.asarray(pack_codes_np(queries))
    d, i = mxu_topk(pq, gg, bgf, valid_n=n, k=k,
                    query_tile=16, col_block=16, interpret=True,
                    rescan_fused=True)
    d, i = np.asarray(d), np.asarray(i)
    d_full = hamming_distance_np(pack_codes_np(queries), packed)
    for qi in range(q):
        order = np.argsort(d_full[qi], kind="stable")[:k]
        np.testing.assert_array_equal(i[qi], order)
        np.testing.assert_array_equal(d[qi], d_full[qi][order])


def test_mxu_topk_fused_adversarial_ties():
    """All-identical codes: rank order is pure index tie-break; the fused
    path must match the unfused engine bit-for-bit."""
    rng = np.random.default_rng(9)
    bits, n, q, k = 64, 900, 6, 50
    base = np.where(rng.uniform(size=bits) < 0.5, -1.0, 1.0)
    codes = np.tile(base, (n, 1)).astype(np.float32)
    queries = np.tile(base, (q, 1)).astype(np.float32)
    _, gg, bgf = _build(codes)
    pq = jnp.asarray(pack_codes_np(queries))
    d0, i0 = mxu_topk(pq, gg, bgf, valid_n=n, k=k,
                      query_tile=16, col_block=16, interpret=True,
                      rescan_fused=False)
    d1, i1 = mxu_topk(pq, gg, bgf, valid_n=n, k=k,
                      query_tile=16, col_block=16, interpret=True,
                      rescan_fused=True)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
