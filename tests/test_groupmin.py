import jax.numpy as jnp
import numpy as np
import pytest

from hashgan_tpu.ops.groupmin import (
    groupmin_scan,
    groupmin_topk,
    to_grouped_layout,
)
from hashgan_tpu.ops.ref_numpy import hamming_distance_np


def _setup(pg, groups=8, col_multiple=64):
    gg = to_grouped_layout(pg, groups=groups, col_multiple=col_multiple)
    n_tot = gg.shape[1] * gg.shape[2]
    pc = np.concatenate(
        [pg, np.zeros((n_tot - pg.shape[0], pg.shape[1]), np.uint32)]
    )
    return jnp.asarray(gg), jnp.asarray(pc)


def test_layout_roundtrip_indexing():
    rng = np.random.default_rng(0)
    pg = rng.integers(0, 2**32, size=(100, 2), dtype=np.uint32)
    gg = to_grouped_layout(pg, groups=4, col_multiple=8)
    w, L, c = gg.shape
    for n in (0, 1, 57, 99):
        s, col = divmod(n, c)
        np.testing.assert_array_equal(gg[:, s, col], pg[n])


@pytest.mark.parametrize("n,words", [(1000, 1), (3000, 4)])
def test_groupmin_topk_exact_vs_oracle(n, words):
    rng = np.random.default_rng(1)
    pg = rng.integers(0, 2**32, size=(n, words), dtype=np.uint32)
    pq = rng.integers(0, 2**32, size=(7, words), dtype=np.uint32)
    gg, pc = _setup(pg)
    k = 30
    d, i, fb = groupmin_topk(
        jnp.asarray(pq), gg, pc, valid_n=n, k=k, repair=8,
        query_tile=8, col_block=64, interpret=True,
    )
    d, i, fb = np.asarray(d), np.asarray(i), np.asarray(fb)
    d_full = hamming_distance_np(pq, pg)
    for qi in range(7):
        assert not fb[qi]
        order = np.argsort(d_full[qi], kind="stable")[:k]
        np.testing.assert_array_equal(i[qi], order)
        np.testing.assert_array_equal(d[qi], d_full[qi][order])


def test_groupmin_heavy_ties_exact():
    rng = np.random.default_rng(2)
    pg = rng.integers(0, 2**32, size=(2000, 1), dtype=np.uint32) & np.uint32(0x7)
    pq = rng.integers(0, 2**32, size=(5, 1), dtype=np.uint32) & np.uint32(0x7)
    gg, pc = _setup(pg)
    d, i, fb = groupmin_topk(
        jnp.asarray(pq), gg, pc, valid_n=2000, k=40, repair=40,
        query_tile=8, col_block=64, interpret=True,
    )
    d_full = hamming_distance_np(pq, pg)
    for qi in range(5):
        if np.asarray(fb)[qi]:
            continue
        order = np.argsort(d_full[qi], kind="stable")[:40]
        np.testing.assert_array_equal(np.asarray(i)[qi], order)


def test_groupmin_flags_fallback_on_adversarial_grouping():
    """2 exact-match items planted in each of 12 distinct columns, k covers
    all: > repair groups are suspicious, so the query must be flagged (and
    never silently wrong)."""
    words, L, cm = 1, 8, 64
    n = L * cm  # c = 64
    rng = np.random.default_rng(3)
    pg = rng.integers(0, 2**32, size=(n, words), dtype=np.uint32) | np.uint32(0xFFFF)
    query = np.zeros((1, words), dtype=np.uint32)
    c = cm
    planted = []
    for j in range(12):  # columns 0..11, rows s=0 and s=1
        pg[0 * c + j] = 0
        pg[1 * c + j] = 0
        planted += [j, c + j]
    gg, pc = _setup(pg, groups=L, col_multiple=cm)
    d, i, fb = groupmin_topk(
        jnp.asarray(query), gg, pc, valid_n=n, k=24, repair=4,
        query_tile=8, col_block=64, interpret=True,
    )
    assert bool(np.asarray(fb)[0])  # must ask for fallback, repair=4 < 12

    # with repair >= k the bound guarantees exactness (flagged <= k/2)
    d, i, fb = groupmin_topk(
        jnp.asarray(query), gg, pc, valid_n=n, k=24, repair=24,
        query_tile=8, col_block=64, interpret=True,
    )
    assert not bool(np.asarray(fb)[0])
    np.testing.assert_array_equal(np.sort(np.asarray(i)[0]), np.sort(planted))


def test_groupmin_valid_n_masks_padding():
    rng = np.random.default_rng(4)
    n = 70  # pads to 8*64=512 items
    pg = rng.integers(0, 2**32, size=(n, 1), dtype=np.uint32)
    pq = np.zeros((2, 1), dtype=np.uint32)  # distance 0 to zero padding!
    gg, pc = _setup(pg)
    d, i, fb = groupmin_topk(
        jnp.asarray(pq), gg, pc, valid_n=n, k=20, repair=20,
        query_tile=8, col_block=64, interpret=True,
    )
    assert (np.asarray(i) < n).all()
    d_full = hamming_distance_np(pq, pg)
    for qi in range(2):
        order = np.argsort(d_full[qi], kind="stable")[:20]
        np.testing.assert_array_equal(np.asarray(i)[qi], order)


def test_groupmin_scan_minkeys_match_bruteforce():
    rng = np.random.default_rng(5)
    n = 256
    pg = rng.integers(0, 2**32, size=(n, 2), dtype=np.uint32)
    pq = rng.integers(0, 2**32, size=(3, 2), dtype=np.uint32)
    gg, pc = _setup(pg, groups=4, col_multiple=64)
    w, L, c = gg.shape
    stride = L * c + 1
    m1, m2 = groupmin_scan(jnp.asarray(pq), gg, n, query_tile=8,
                           col_block=64, interpret=True)
    d_full = hamming_distance_np(pq, pg)
    keys = d_full.astype(np.int64) * stride + np.arange(n)[None, :]
    for qi in range(3):
        for col in range(c):
            idxs = [s * c + col for s in range(L) if s * c + col < n]
            ks = sorted(keys[qi, idxs])
            assert m1[qi, col] == ks[0]
            expect2 = ks[1] if len(ks) > 1 else np.iinfo(np.int32).max
            assert m2[qi, col] == expect2
