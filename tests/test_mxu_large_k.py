"""Exact large-k MXU engine (ops/mxu_large_k.py): oracle-bit-identical at
k in the thousands (the reference protocol's MAP@5000 shape — SURVEY.md
§3.3), adversarial ties, padding sentinels, and the selection/compaction
building blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hashgan_tpu.ops import hamming_distance_np, pack_codes_np
from hashgan_tpu.ops.groupmin import to_grouped_layout
from hashgan_tpu.ops.mxu_large_k import (
    _compact_masked,
    count_select_threshold,
    mxu_topk_large,
)
from hashgan_tpu.ops.mxu_scan import to_group_major


def _build(codes_pm1, groups=8, col_multiple=16):
    packed = pack_codes_np(codes_pm1)
    gg = to_grouped_layout(packed, groups=groups, col_multiple=col_multiple)
    bg = to_group_major(packed, groups=groups, col_multiple=col_multiple)
    c, L, w = bg.shape
    return packed, jnp.asarray(gg), jnp.asarray(bg.reshape(c, L * w))


def _oracle_check(d, i, pq, packed, k):
    d, i = np.asarray(d), np.asarray(i)
    d_full = hamming_distance_np(np.asarray(pq), packed)
    n = packed.shape[0]
    for qi in range(d.shape[0]):
        order = np.argsort(d_full[qi], kind="stable")[: min(k, n)]
        np.testing.assert_array_equal(i[qi][: len(order)], order)
        np.testing.assert_array_equal(d[qi][: len(order)], d_full[qi][order])


@pytest.mark.parametrize("select,compact", [
    ("radix", "scatter"), ("radix", "searchsorted"), ("twolevel", "scatter"),
    ("sortdecode", "scatter"),
])
@pytest.mark.parametrize("bits,n,q,k,sigma", [
    (32, 8192, 4, 1000, 2),
    (64, 6000, 3, 1000, 4),
    (32, 12800, 2, 5000, 2),
])
def test_large_k_matches_oracle(bits, n, q, k, sigma, select, compact):
    rng = np.random.default_rng(bits + n + k)
    codes = np.where(rng.uniform(size=(n, bits)) < 0.5, -1.0, 1.0).astype(np.float32)
    queries = np.where(rng.uniform(size=(q, bits)) < 0.5, -1.0, 1.0).astype(np.float32)
    packed, gg, bgf = _build(codes)
    pq = jnp.asarray(pack_codes_np(queries))
    d, i = mxu_topk_large(pq, gg, bgf, valid_n=n, k=k, sigma=sigma,
                          query_tile=8, col_block=16, interpret=True,
                          select=select, compact=compact)
    _oracle_check(d, i, pq, packed, k)


@pytest.mark.parametrize("select", ["radix", "twolevel", "sortdecode"])
def test_large_k_adversarial_ties(select):
    """Near-total tie mass: thousands of items share each distance, so the
    index tie-break carries the whole ordering."""
    rng = np.random.default_rng(17)
    n, bits, k = 8192, 32, 2000
    codes = np.where(rng.uniform(size=(n, bits)) < 0.03, -1.0, 1.0).astype(np.float32)
    packed, gg, bgf = _build(codes)
    pq = jnp.asarray(pack_codes_np(np.ones((3, bits), dtype=np.float32)))
    d, i = mxu_topk_large(pq, gg, bgf, valid_n=n, k=k, sigma=2,
                          query_tile=8, col_block=16, interpret=True,
                          select=select)
    _oracle_check(d, i, pq, packed, k)


def test_large_k_padding_sentinels():
    """k above the valid item count: the real prefix is oracle-exact and
    every overflow slot carries the sentinel (d = bits+1, i = n_total)."""
    rng = np.random.default_rng(5)
    n, bits, k = 3000, 32, 5000
    codes = np.where(rng.uniform(size=(n, bits)) < 0.5, -1.0, 1.0).astype(np.float32)
    packed, gg, bgf = _build(codes)
    pq = jnp.asarray(pack_codes_np(
        np.where(rng.uniform(size=(3, bits)) < 0.5, -1.0, 1.0).astype(np.float32)))
    d, i = mxu_topk_large(pq, gg, bgf, valid_n=n, k=k, sigma=2,
                          query_tile=8, col_block=16, interpret=True)
    d, i = np.asarray(d), np.asarray(i)
    n_total = 8 * to_grouped_layout(packed, groups=8, col_multiple=16).shape[2]
    assert (d[:, n:] == bits + 1).all()
    assert (i[:, n:] == n_total).all()
    _oracle_check(d[:, :n], i[:, :n], pq, packed, n)


def test_large_k_matches_small_k_engine_at_boundary():
    """At k=256 (the routing boundary) the subgroup engine and the column
    engine must return bit-identical rankings."""
    from hashgan_tpu.ops.mxu_scan import mxu_topk

    rng = np.random.default_rng(9)
    n, bits, k = 4096, 32, 256
    codes = np.where(rng.uniform(size=(n, bits)) < 0.3, -1.0, 1.0).astype(np.float32)
    packed, gg, bgf = _build(codes)
    pq = jnp.asarray(pack_codes_np(
        np.where(rng.uniform(size=(4, bits)) < 0.5, -1.0, 1.0).astype(np.float32)))
    d_s, i_s = mxu_topk(pq, gg, bgf, valid_n=n, k=k,
                        query_tile=8, col_block=16, interpret=True)
    d_l, i_l = mxu_topk_large(pq, gg, bgf, valid_n=n, k=k, sigma=4,
                              query_tile=8, col_block=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_l))
    np.testing.assert_array_equal(np.asarray(d_s), np.asarray(d_l))


def test_large_k_approx_mode():
    """Approx mode: returned distances are correct for returned ids and
    recall of the true top-k stays high (subgroup minima collide less than
    column minima)."""
    rng = np.random.default_rng(11)
    n, bits, k = 8192, 64, 500
    codes = np.where(rng.uniform(size=(n, bits)) < 0.5, -1.0, 1.0).astype(np.float32)
    packed, gg, bgf = _build(codes)
    pq = jnp.asarray(pack_codes_np(
        np.where(rng.uniform(size=(4, bits)) < 0.5, -1.0, 1.0).astype(np.float32)))
    d, i = mxu_topk_large(pq, gg, bgf, valid_n=n, k=k, sigma=2, mode="approx",
                          query_tile=8, col_block=16, interpret=True,
                          recall_target=0.99)
    d, i = np.asarray(d), np.asarray(i)
    d_full = hamming_distance_np(np.asarray(pq), packed)
    recalls = []
    for qi in range(4):
        true = set(np.argsort(d_full[qi], kind="stable")[:k].tolist())
        got = set(i[qi][i[qi] < n].tolist())
        for pos, idx in enumerate(i[qi]):
            if idx < n:
                assert d[qi][pos] == d_full[qi][idx]
        recalls.append(len(true & got) / k)
    assert np.mean(recalls) > 0.85, recalls


@pytest.mark.parametrize("m,kk,hi", [(257, 40, 1000), (4096, 1000, 300_000),
                                     (512, 512, 600), (1024, 1, 2**27)])
def test_count_select_threshold_exact(m, kk, hi):
    rng = np.random.default_rng(m + kk)
    keys = np.stack([
        rng.choice(hi + 1, size=m, replace=False) for _ in range(3)
    ]).astype(np.int32)
    tau = np.asarray(count_select_threshold(jnp.asarray(keys), kk, hi))
    expect = np.sort(keys, axis=1)[:, kk - 1]
    np.testing.assert_array_equal(tau, expect)


@pytest.mark.parametrize("method", ["scatter", "searchsorted"])
def test_compact_masked_preserves_order(method):
    rng = np.random.default_rng(3)
    q, m, kk = 5, 997, 40
    values = rng.integers(0, 1 << 30, size=(q, m)).astype(np.int32)
    mask = np.zeros((q, m), bool)
    for r in range(q):
        mask[r, rng.choice(m, kk, replace=False)] = True
    out = np.asarray(_compact_masked(
        jnp.asarray(values), jnp.asarray(mask), kk, method=method))
    for r in range(q):
        np.testing.assert_array_equal(out[r], values[r][mask[r]])


def test_gallery_routes_large_k_to_subgroup_engine(monkeypatch):
    """PackedGallery.topk with Pallas enabled must route k > 256 to the
    subgroup-min engine (production layouts: groups=128, col_multiple=256)
    and stay oracle-exact."""
    import hashgan_tpu.ops.mxu_large_k as mlk
    from hashgan_tpu.index import build_gallery

    real = mlk.mxu_topk_large
    calls = []

    def spy(*args, **kw):
        calls.append(kw.get("k"))
        kw["interpret"] = True
        return real(*args, **kw)

    monkeypatch.setattr(mlk, "mxu_topk_large", spy)
    rng = np.random.default_rng(23)
    n, bits, k = 3000, 32, 1000
    codes = np.where(rng.uniform(size=(n, bits)) < 0.5, -1.0, 1.0).astype(np.float32)
    labels = np.eye(2, dtype=np.float32)[np.zeros(n, int)]
    gal = build_gallery(jnp.asarray(codes), labels, bits, use_pallas=False)
    pq = pack_codes_np(np.where(
        rng.uniform(size=(3, bits)) < 0.5, -1.0, 1.0).astype(np.float32))
    d, i = gal.topk(jnp.asarray(pq), k=k, use_pallas=True)
    assert calls, "large-k query did not route to mxu_topk_large"
    _oracle_check(d, i, jnp.asarray(pq), pack_codes_np(codes), k)


def test_gallery_routes_large_k_sharded(monkeypatch):
    """Mesh galleries route k > 256 to the sharded subgroup-min engine;
    result must be oracle-exact (and bit-equal across mesh sizes)."""
    import hashgan_tpu.parallel.sharded_scan as ss
    from hashgan_tpu.index import build_gallery
    from hashgan_tpu.parallel import make_mesh

    real = ss.sharded_mxu_topk_large
    calls = []

    def spy(*args, **kw):
        calls.append(kw.get("k"))
        kw["interpret"] = True
        return real(*args, **kw)

    monkeypatch.setattr(ss, "sharded_mxu_topk_large", spy)
    rng = np.random.default_rng(29)
    n, bits, k = 3000, 32, 700
    codes = np.where(rng.uniform(size=(n, bits)) < 0.4, -1.0, 1.0).astype(np.float32)
    labels = np.eye(2, dtype=np.float32)[np.zeros(n, int)]
    pq = pack_codes_np(np.where(
        rng.uniform(size=(2, bits)) < 0.5, -1.0, 1.0).astype(np.float32))
    mesh = make_mesh(2)
    gal = build_gallery(jnp.asarray(codes), labels, bits, mesh=mesh,
                        use_pallas=False)
    d, i = gal.topk(jnp.asarray(pq), k=k, use_pallas=True)
    assert calls, "large-k mesh query did not route to sharded engine"
    _oracle_check(d, i, jnp.asarray(pq), pack_codes_np(codes), k)


@pytest.mark.parametrize("n_dev,select", [(1, "twolevel"), (2, "twolevel"),
                                          (8, "twolevel"), (2, "sortdecode"),
                                          (8, "sortdecode")])
def test_sharded_large_k_matches_single_chip(n_dev, select):
    """Sharded subgroup-min engine: bit-identical to the oracle at mesh
    sizes 1/2/8, k past the per-shard valid counts (sentinel merge)."""
    from hashgan_tpu.parallel import make_mesh
    from hashgan_tpu.parallel.sharded_scan import (
        shard_grouped_gallery, sharded_mxu_topk_large,
    )

    mesh = make_mesh(n_dev)
    rng = np.random.default_rng(n_dev + 61)
    n, bits, k = 5000, 32, 900
    codes = np.where(rng.uniform(size=(n, bits)) < 0.3, -1.0, 1.0).astype(np.float32)
    packed = pack_codes_np(codes)
    pq = jnp.asarray(pack_codes_np(
        np.where(rng.uniform(size=(3, bits)) < 0.5, -1.0, 1.0).astype(np.float32)))
    grouped, canon, valids, canon_bg, _ = shard_grouped_gallery(
        mesh, packed, groups=8, col_multiple=16
    )
    d, i = sharded_mxu_topk_large(
        mesh, pq, grouped, canon_bg, valids, n=n, k=k, sigma=2,
        query_tile=8, col_block=16, interpret=True, select=select,
    )
    _oracle_check(d, i, pq, packed, k)
