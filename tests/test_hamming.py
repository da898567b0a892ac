import jax.numpy as jnp
import numpy as np
import pytest

from hashgan_tpu.ops import hamming_distance, hamming_distance_np, pack_codes_np
from hashgan_tpu.ops.hamming import hamming_distance_jnp, hamming_scan_topk


def _random_packed(rng, n, words):
    return rng.integers(0, 2**32, size=(n, words), dtype=np.uint32)


@pytest.mark.parametrize("words", [1, 2, 4])
def test_hamming_np_bruteforce(words):
    rng = np.random.default_rng(0)
    q = _random_packed(rng, 5, words)
    g = _random_packed(rng, 9, words)
    d = hamming_distance_np(q, g)
    for i in range(5):
        for j in range(9):
            expect = sum(
                bin(int(q[i, w]) ^ int(g[j, w])).count("1") for w in range(words)
            )
            assert d[i, j] == expect


@pytest.mark.parametrize("words", [1, 2, 4])
def test_hamming_jnp_matches_oracle(words):
    rng = np.random.default_rng(1)
    q = _random_packed(rng, 23, words)
    g = _random_packed(rng, 57, words)
    got = np.asarray(hamming_distance_jnp(jnp.asarray(q), jnp.asarray(g)))
    np.testing.assert_array_equal(got, hamming_distance_np(q, g))


@pytest.mark.parametrize("words", [1, 4])
def test_hamming_pallas_interpret_matches_oracle(words):
    rng = np.random.default_rng(2)
    q = _random_packed(rng, 30, words)   # non-multiples of tiles
    g = _random_packed(rng, 100, words)
    got = np.asarray(
        hamming_distance(
            jnp.asarray(q), jnp.asarray(g), interpret=True,
            query_tile=16, gallery_tile=64,
        )
    )
    np.testing.assert_array_equal(got, hamming_distance_np(q, g))


def test_hamming_consistent_with_unpacked_codes():
    rng = np.random.default_rng(3)
    codes_q = rng.standard_normal((7, 64)).astype(np.float32)
    codes_g = rng.standard_normal((11, 64)).astype(np.float32)
    pq, pg = pack_codes_np(codes_q), pack_codes_np(codes_g)
    d = hamming_distance_np(pq, pg)
    bq = (codes_q > 0)
    bg = (codes_g > 0)
    expect = (bq[:, None, :] != bg[None, :, :]).sum(axis=-1)
    np.testing.assert_array_equal(d, expect)


@pytest.mark.parametrize("use_small_bits", [True, False])
def test_scan_topk_matches_argsort(use_small_bits):
    """Top-k scan must match stable-argsort ranking including tie-breaks.

    use_small_bits=True forces 1 word (many distance ties)."""
    rng = np.random.default_rng(4)
    words = 1 if use_small_bits else 4
    q = _random_packed(rng, 6, words)
    # Small value range -> heavy ties when words == 1
    g = (
        _random_packed(rng, 500, words) & np.uint32(0xF)
        if use_small_bits
        else _random_packed(rng, 500, words)
    )
    k = 37
    d_full = hamming_distance_np(q, g)
    dists, idxs = hamming_scan_topk(
        jnp.asarray(q), jnp.asarray(g.T), k=k, slab=128, use_pallas=False
    )
    dists, idxs = np.asarray(dists), np.asarray(idxs)
    for i in range(q.shape[0]):
        order = np.argsort(d_full[i], kind="stable")[:k]
        np.testing.assert_array_equal(idxs[i], order)
        np.testing.assert_array_equal(dists[i], d_full[i][order])


def test_scan_topk_k_larger_than_slab_tail():
    rng = np.random.default_rng(5)
    q = _random_packed(rng, 3, 2)
    g = _random_packed(rng, 130, 2)  # 130 not a multiple of slab 64
    dists, idxs = hamming_scan_topk(
        jnp.asarray(q), jnp.asarray(g.T), k=10, slab=64, use_pallas=False
    )
    d_full = hamming_distance_np(q, g)
    for i in range(3):
        order = np.argsort(d_full[i], kind="stable")[:10]
        np.testing.assert_array_equal(np.asarray(idxs)[i], order)
