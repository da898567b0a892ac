"""Per-slab rebased keys (ops/slab_scan.py): the MXU path past the int32
composite ceiling — multi-slab merges bit-exact vs the oracle, incl. ties
straddling slab boundaries and k above the valid count."""

import jax.numpy as jnp
import numpy as np
import pytest

from hashgan_tpu.ops import hamming_distance_np, pack_codes_np
from hashgan_tpu.ops.slab_scan import (
    build_slabbed_layout,
    mxu_slab_capacity,
    mxu_topk_slabbed,
)


def _oracle_check(d, i, pq, packed, k):
    d, i = np.asarray(d), np.asarray(i)
    d_full = hamming_distance_np(np.asarray(pq), packed)
    n = packed.shape[0]
    for qi in range(d.shape[0]):
        order = np.argsort(d_full[qi], kind="stable")[: min(k, n)]
        np.testing.assert_array_equal(i[qi][: len(order)], order)
        np.testing.assert_array_equal(d[qi][: len(order)], d_full[qi][order])


@pytest.mark.parametrize("bits,n,q,k,slab_items", [
    (32, 3000, 5, 60, 1024),      # 3 slabs, small-k per-slab engine
    (64, 2500, 3, 500, 1024),     # large-k per-slab engine
    (32, 5000, 2, 6000, 2048),    # k past n: sentinels through the merge
])
def test_slabbed_matches_oracle(bits, n, q, k, slab_items):
    rng = np.random.default_rng(bits + n + k)
    codes = np.where(rng.uniform(size=(n, bits)) < 0.5, -1.0, 1.0).astype(np.float32)
    packed = pack_codes_np(codes)
    gs, bgs, valids, si = build_slabbed_layout(
        packed, groups=8, col_multiple=16, slab_items=slab_items
    )
    assert gs.shape[0] == -(-n // slab_items)
    pq = jnp.asarray(pack_codes_np(np.where(
        rng.uniform(size=(q, bits)) < 0.5, -1.0, 1.0).astype(np.float32)))
    d, i = mxu_topk_slabbed(
        pq, gs, bgs, valids, n=n, slab_items=si, k=k,
        query_tile=8, col_block=16, interpret=True,
    )
    if k > n:
        d, i = np.asarray(d), np.asarray(i)
        assert (d[:, n:] == bits + 1).all()
        assert (i[:, n:] == n).all()
    _oracle_check(d, i, pq, packed, k)


def test_slabbed_ties_across_slab_boundaries():
    """Duplicated codes on both sides of every slab boundary: the merge's
    position key must reproduce the global index tie-break exactly."""
    rng = np.random.default_rng(7)
    n, bits, k, slab_items = 4096, 32, 300, 1024
    pool = np.where(rng.uniform(size=(5, bits)) < 0.5, -1.0, 1.0)
    codes = pool[rng.integers(0, 5, n)].astype(np.float32)
    packed = pack_codes_np(codes)
    gs, bgs, valids, si = build_slabbed_layout(
        packed, groups=8, col_multiple=16, slab_items=slab_items
    )
    pq = jnp.asarray(pack_codes_np(np.ones((4, bits), dtype=np.float32)))
    d, i = mxu_topk_slabbed(
        pq, gs, bgs, valids, n=n, slab_items=si, k=k,
        query_tile=8, col_block=16, interpret=True,
    )
    _oracle_check(d, i, pq, packed, k)


def test_capacity_formula_matches_kernel_assert():
    for w in (1, 2, 4):
        bits = 32 * w
        cap = mxu_slab_capacity(w)
        # must satisfy BOTH engines' bounds (mxu_topk_slabbed routes k>256
        # and approx slabs to mxu_topk_large, whose bound is the stricter)
        assert (bits + 1) * (cap + 1) + cap < 2**31
        assert (bits + 2) * (cap + 1) + cap < 2**31
        # one more layout unit overflows the strict bound (tightness)
        nxt = cap + 128 * 256
        assert (bits + 2) * (nxt + 1) + nxt >= 2**31
    assert mxu_slab_capacity(4) > 16_000_000   # ~16.4M at 128-bit
    assert mxu_slab_capacity(1) > 60_000_000   # ~61M at 32-bit


def test_gallery_builds_slabbed_beyond_capacity(monkeypatch):
    """Past groupmin capacity the builder must produce the slabbed layout
    (not silently fall to the sort engine) and topk must route to it."""
    import hashgan_tpu.ops.groupmin as gm
    import hashgan_tpu.ops.slab_scan as ss
    from hashgan_tpu.index import build_gallery

    monkeypatch.setattr(gm, "groupmin_capacity_ok", lambda *a, **k: False)
    monkeypatch.setattr(ss, "mxu_slab_capacity", lambda *a, **k: 32768)
    real = ss.mxu_topk_slabbed
    calls = []

    def spy(*args, **kw):
        calls.append(kw.get("k"))
        kw["interpret"] = True
        return real(*args, **kw)

    monkeypatch.setattr(ss, "mxu_topk_slabbed", spy)
    rng = np.random.default_rng(3)
    n, bits, k = 70_000, 32, 50
    codes = np.where(rng.uniform(size=(n, bits)) < 0.5, -1.0, 1.0).astype(np.float32)
    labels = np.eye(2, dtype=np.float32)[np.zeros(n, int)]
    gal = build_gallery(jnp.asarray(codes), labels, bits, use_pallas=False)
    assert gal.gallery_grouped is None
    assert gal.gallery_slabbed is not None
    assert gal.gallery_slabbed[0].shape[0] == 3  # slabs
    pq = pack_codes_np(np.where(
        rng.uniform(size=(2, bits)) < 0.5, -1.0, 1.0).astype(np.float32))
    d, i = gal.topk(jnp.asarray(pq), k=k, use_pallas=True)
    assert calls, "over-capacity gallery did not route to the slab engine"
    _oracle_check(d, i, jnp.asarray(pq), pack_codes_np(codes), k)


@pytest.mark.slow
def test_20m_gallery_through_mxu_path():
    """VERDICT r2 #7 done-criterion: a 20M-item small-word gallery runs the
    MXU path (5 rebased slabs at the production 128x256 layout), bit-exact
    vs the numpy oracle — no sort fallback."""
    rng = np.random.default_rng(0)
    n, w, k = 20_000_000, 1, 100
    packed = rng.integers(0, 2**32, (n, w), dtype=np.uint32)
    gs, bgs, valids, si = build_slabbed_layout(packed, slab_items=1 << 22)
    assert gs.shape == (5, 1, 128, 32768)
    pq = jnp.asarray(rng.integers(0, 2**32, (2, w), dtype=np.uint32))
    d, i = mxu_topk_slabbed(
        pq, gs, bgs, valids, n=n, slab_items=si, k=k,
        query_tile=8, col_block=256, interpret=True,
    )
    _oracle_check(d, i, pq, packed, k)
