"""Ring-rotation sharded top-k (parallel/sharded_scan.py::ring_hamming_topk,
SURVEY.md §5 "optional ppermute ring" — VERDICT r3 missing #5): gallery
shards resident, query blocks rotate via ppermute. Must be BIT-IDENTICAL to
the all_gather engine and the single-chip scan — same total order
(distance asc, database index asc) — at mesh {1, 2, 8}, with tail padding
and adversarial ties."""

import jax.numpy as jnp
import numpy as np
import pytest

from hashgan_tpu.ops.hamming import hamming_scan_topk
from hashgan_tpu.ops import pack_codes_np
from hashgan_tpu.parallel.mesh import make_mesh
from hashgan_tpu.parallel.sharded_scan import (
    ring_hamming_topk,
    sharded_hamming_topk,
)


def _case(seed, n=512, q=16, bits=32, tie_heavy=False):
    rng = np.random.default_rng(seed)
    codes = np.where(
        rng.uniform(size=(n, bits)) < 0.5, -1.0, 1.0
    ).astype(np.float32)
    pg = pack_codes_np(codes)
    if tie_heavy:
        pq = pg[:q].copy()  # exact hits + massive distance ties
    else:
        pq = pack_codes_np(np.where(
            rng.uniform(size=(q, bits)) < 0.5, -1.0, 1.0).astype(np.float32))
    return jnp.asarray(pq), jnp.asarray(pg.T)


@pytest.mark.parametrize("nd", [1, 2, 8])
@pytest.mark.parametrize("tie_heavy", [False, True])
def test_ring_matches_allgather_and_single_chip(nd, tie_heavy):
    pq, gt = _case(3, tie_heavy=tie_heavy)
    mesh = make_mesh(nd)
    k = 20
    d_ring, i_ring = ring_hamming_topk(mesh, pq, gt, k=k, slab=64,
                                       use_pallas=False)
    d_ag, i_ag = sharded_hamming_topk(mesh, pq, gt, k=k, slab=64,
                                      use_pallas=False)
    d_1, i_1 = hamming_scan_topk(pq, gt, k=k, slab=64, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(i_ring), np.asarray(i_1))
    np.testing.assert_array_equal(np.asarray(d_ring), np.asarray(d_1))
    np.testing.assert_array_equal(np.asarray(i_ring), np.asarray(i_ag))
    np.testing.assert_array_equal(np.asarray(d_ring), np.asarray(d_ag))


@pytest.mark.parametrize("nd", [2, 8])
def test_ring_with_tail_padding(nd):
    # valid_n < N: layout padding must surface as index >= valid_n
    # sentinels, identically to the single-chip scan.
    pq, gt = _case(5, n=512)
    valid_n = 400
    mesh = make_mesh(nd)
    k = 500  # deeper than valid items: sentinels must appear
    d_ring, i_ring = ring_hamming_topk(
        mesh, pq, gt, k=k, slab=64, use_pallas=False, valid_n=valid_n)
    d_1, i_1 = hamming_scan_topk(
        pq, gt, k=min(k, gt.shape[1]), slab=64, use_pallas=False,
        valid_n=valid_n)
    # Every valid item ranks inside k=500, so the first valid_n entries
    # must match bit-for-bit; the tail is sentinels, whose contract is
    # "distance > bits, index >= valid_n" (exact id is engine-specific).
    np.testing.assert_array_equal(
        np.asarray(i_ring)[:, :valid_n], np.asarray(i_1)[:, :valid_n])
    np.testing.assert_array_equal(
        np.asarray(d_ring)[:, :valid_n], np.asarray(d_1)[:, :valid_n])
    sent = np.asarray(d_ring) > 32
    assert (np.asarray(i_ring)[sent] >= valid_n).all()
    assert sent.any() and not sent[:, :valid_n].any()


def test_ring_rejects_indivisible_queries():
    pq, gt = _case(7, q=15)
    with pytest.raises(AssertionError, match="queries"):
        ring_hamming_topk(make_mesh(2), pq, gt, k=5, use_pallas=False)
