"""int32 composite-key ceilings must degrade gracefully (VERDICT r1 #8).

- The sort engine's >16M fallback (plain-distance top_k) must stay exact:
  position order equals index order at every merge (forced via the
  _force_plain_tiebreak test hook — same code path a 20M+-item gallery takes).
- The grouped engine's capacity predicate must match its key space, and the
  gallery builder must decline the grouped layout (not assert) beyond it.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hashgan_tpu.ops import hamming_distance_np, pack_codes_np
from hashgan_tpu.ops.groupmin import PAD_BASE, groupmin_capacity_ok
from hashgan_tpu.ops.hamming import hamming_scan_topk


@pytest.mark.parametrize("seed", [0, 1])
def test_plain_tiebreak_merge_is_exact_under_heavy_ties(seed):
    rng = np.random.default_rng(seed)
    n, bits, k = 3000, 32, 120
    # heavy ties: few distinct codes, many duplicates across slab boundaries
    pool = np.where(rng.uniform(size=(7, bits)) < 0.5, -1.0, 1.0)
    codes = pool[rng.integers(0, 7, n)].astype(np.float32)
    pg = pack_codes_np(codes)
    pq = pack_codes_np(np.where(
        rng.uniform(size=(5, bits)) < 0.5, -1.0, 1.0).astype(np.float32))
    d, i = hamming_scan_topk(
        jnp.asarray(pq), jnp.asarray(pg.T), k=k, slab=256, use_pallas=False,
        _force_plain_tiebreak=True,
    )
    d, i = np.asarray(d), np.asarray(i)
    d_full = hamming_distance_np(pq, pg)
    for qi in range(pq.shape[0]):
        order = np.argsort(d_full[qi], kind="stable")[:k]
        np.testing.assert_array_equal(i[qi], order)
        np.testing.assert_array_equal(d[qi], d_full[qi][order])


def test_plain_tiebreak_with_padding_and_valid_n():
    rng = np.random.default_rng(2)
    n, bits, k = 90, 32, 128  # k > valid n: sentinel slots must appear
    codes = np.where(rng.uniform(size=(n, bits)) < 0.5, -1.0, 1.0).astype(np.float32)
    pg = pack_codes_np(codes)
    pg_pad = np.concatenate([pg, np.zeros((38, pg.shape[1]), np.uint32)])
    pq = pack_codes_np(np.ones((3, bits), dtype=np.float32))
    d, i = hamming_scan_topk(
        jnp.asarray(pq), jnp.asarray(pg_pad.T), k=k, slab=32, use_pallas=False,
        valid_n=n, _force_plain_tiebreak=True,
    )
    d, i = np.asarray(d), np.asarray(i)
    d_full = hamming_distance_np(pq, pg)
    for qi in range(3):
        order = np.argsort(d_full[qi], kind="stable")[:n]
        np.testing.assert_array_equal(i[qi][:n], order)
        assert (d[qi][n:] > bits).all()  # padding slots are sentinels


def test_groupmin_capacity_predicate_boundaries():
    # 128-bit: stride*(129) must stay under PAD_BASE -> ~7.7M items
    assert groupmin_capacity_ok(1_000_000, 4)
    assert groupmin_capacity_ok(7_000_000, 4)
    assert not groupmin_capacity_ok(8_000_000, 4)
    # 32-bit codes: ~30M
    assert groupmin_capacity_ok(29_000_000, 1)
    assert not groupmin_capacity_ok(40_000_000, 1)
    # the exact bound the kernel asserts
    unit = 128 * 256
    for n in (1_000_000, 7_700_000, 7_800_000):
        n_pad = -(-n // unit) * unit
        kernel_ok = (32 * 4 + 1) * (n_pad + 1) + n_pad < PAD_BASE
        assert groupmin_capacity_ok(n, 4) == kernel_ok, n


def test_gallery_builder_declines_grouped_beyond_capacity(monkeypatch):
    import hashgan_tpu.ops.groupmin as gm
    from hashgan_tpu.index import build_gallery

    monkeypatch.setattr(gm, "groupmin_capacity_ok", lambda *a, **k: False)
    rng = np.random.default_rng(0)
    n, bits, k = 600, 32, 50
    codes = rng.standard_normal((n, bits)).astype(np.float32)
    labels = np.eye(2, dtype=np.float32)[np.zeros(n, int)]
    gal = build_gallery(jnp.asarray(codes), labels, bits, use_pallas=False)
    assert gal.gallery_grouped is None  # grouped layout declined
    pq = jnp.asarray(pack_codes_np(rng.standard_normal((4, bits)).astype(np.float32)))
    d, i = gal.topk(pq, k=k, use_pallas=False)  # sort engine, still exact
    d_full = hamming_distance_np(np.asarray(pq), pack_codes_np(codes))
    for qi in range(4):
        order = np.argsort(d_full[qi], kind="stable")[:k]
        np.testing.assert_array_equal(np.asarray(i)[qi], order)
