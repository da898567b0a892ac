import jax.numpy as jnp
import numpy as np
import pytest

from hashgan_tpu.eval.oracle import average_precision_np
from hashgan_tpu.eval.streaming import (
    device_distance_histograms,
    distance_histograms_np,
    pr_curve_from_hist,
    precision_at_radius_from_hist,
    tie_aware_map,
    tie_aware_map_np,
)
from hashgan_tpu.ops import hamming_distance_np


def _case(seed, q=6, n=300, words=1, n_classes=3):
    rng = np.random.default_rng(seed)
    pq = rng.integers(0, 2**32, size=(q, words), dtype=np.uint32)
    pg = rng.integers(0, 2**32, size=(n, words), dtype=np.uint32)
    qlab = np.eye(n_classes, dtype=np.float32)[rng.integers(0, n_classes, q)]
    dlab = np.eye(n_classes, dtype=np.float32)[rng.integers(0, n_classes, n)]
    return pq, pg, qlab, dlab


def test_device_histograms_match_numpy():
    pq, pg, qlab, dlab = _case(0, words=2)
    d = hamming_distance_np(pq, pg)
    rel = (qlab @ dlab.T) > 0
    n_np, r_np = distance_histograms_np(d, rel, 64)
    n_dev, r_dev = device_distance_histograms(
        jnp.asarray(pq), jnp.asarray(pg.T), jnp.asarray(qlab),
        jnp.asarray(dlab), slab=64, use_pallas=False,
    )
    np.testing.assert_array_equal(np.asarray(n_dev), n_np)
    np.testing.assert_array_equal(np.asarray(r_dev), r_np)


def test_histograms_with_nonmultiple_slab():
    pq, pg, qlab, dlab = _case(1, n=130, words=1)
    d = hamming_distance_np(pq, pg)
    rel = (qlab @ dlab.T) > 0
    n_np, r_np = distance_histograms_np(d, rel, 32)
    n_dev, r_dev = device_distance_histograms(
        jnp.asarray(pq), jnp.asarray(pg.T), jnp.asarray(qlab),
        jnp.asarray(dlab), slab=64, use_pallas=False,
    )
    np.testing.assert_array_equal(np.asarray(n_dev), n_np)
    assert int(np.asarray(n_dev).sum()) == 6 * 130  # padding not counted


def test_tie_aware_map_closed_form_matches_position_loop():
    pq, pg, qlab, dlab = _case(2, q=8, n=500)
    d = hamming_distance_np(pq, pg)
    rel = (qlab @ dlab.T) > 0
    n_h, r_h = distance_histograms_np(d, rel, 32)
    for R in (10, 100, 500):
        oracle = tie_aware_map_np(n_h, r_h, R)
        dev = float(tie_aware_map(jnp.asarray(n_h), jnp.asarray(r_h), R))
        assert abs(dev - oracle) < 1e-4, (R, dev, oracle)


def test_tie_aware_map_is_expected_ap_monte_carlo():
    """The tie-aware MAP must equal the Monte-Carlo mean of exact AP over
    random database orderings (the defining contract)."""
    rng = np.random.default_rng(3)
    n, R = 120, 40
    dist = rng.integers(0, 6, size=n)          # heavy ties
    rel = rng.random(n) < 0.3
    n_h, r_h = distance_histograms_np(dist[None], rel[None], 8)
    expect = tie_aware_map_np(n_h, r_h, R)
    samples = []
    for _ in range(3000):
        perm = rng.permutation(n)
        samples.append(average_precision_np(dist[perm], rel[perm], R))
    mc = float(np.mean(samples))
    # ratio-of-expectations vs expectation-of-ratio: identical here because
    # hits-in-top-R is a.s. constant when ties don't straddle the cutoff...
    # allow MC noise + cutoff-bin variance.
    assert abs(expect - mc) < 0.01, (expect, mc)


def test_no_ties_reduces_to_exact_ap():
    """With all-distinct distances the tie-aware MAP is the plain AP."""
    rng = np.random.default_rng(4)
    n, R = 50, 20
    dist = rng.permutation(n)  # all distinct
    rel = rng.random(n) < 0.4
    n_h, r_h = distance_histograms_np(dist[None], rel[None], n)
    expect = average_precision_np(dist, rel, R)
    got = tie_aware_map_np(n_h, r_h, R)
    assert abs(got - expect) < 1e-9


def test_radius_metrics_from_hist():
    pq, pg, qlab, dlab = _case(5, words=2)
    d = hamming_distance_np(pq, pg)
    rel = (qlab @ dlab.T) > 0
    n_h, r_h = distance_histograms_np(d, rel, 64)
    from hashgan_tpu.eval.oracle import precision_at_radius_np

    for radius in (0, 2, 10):
        expect = precision_at_radius_np(d, qlab, dlab, radius=radius)
        got = float(precision_at_radius_from_hist(
            jnp.asarray(n_h), jnp.asarray(r_h), radius
        ))
        assert abs(got - expect) < 1e-6
    p, r = pr_curve_from_hist(n_h, r_h)
    assert (np.diff(r) >= -1e-12).all() and abs(r[-1] - 1.0) < 1e-9


def test_precision_at_topn_matches_position_loop_oracle():
    from hashgan_tpu.eval.streaming import (
        precision_at_topn_from_hist,
        precision_at_topn_np,
    )

    pq, pg, qlab, dlab = _case(7, q=5, n=200, words=1)
    d = hamming_distance_np(pq, pg)
    rel = (qlab @ dlab.T) > 0
    n_hist, r_hist = distance_histograms_np(d, rel, 32)
    topns = np.array([1, 2, 5, 10, 50, 100, 200, 500])
    got = precision_at_topn_from_hist(n_hist, r_hist, topns)
    want = precision_at_topn_np(d, rel, topns)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_precision_at_topn_no_ties_exact():
    from hashgan_tpu.eval.streaming import precision_at_topn_from_hist

    # Distinct distances: expected precision@N equals the deterministic
    # ranked precision.
    q, n = 3, 40
    rng = np.random.default_rng(3)
    d = np.stack([rng.permutation(n) for _ in range(q)]).astype(np.int64)
    rel = rng.random((q, n)) < 0.3
    n_hist, r_hist = distance_histograms_np(d, rel, n)
    topns = np.array([1, 3, 7, 20, 40])
    got = precision_at_topn_from_hist(n_hist, r_hist, topns)
    want = []
    for N in topns:
        ps = []
        for qi in range(q):
            order = np.argsort(d[qi])
            ps.append(rel[qi][order][:N].mean())
        want.append(np.mean(ps))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-12)


def test_precision_at_topn_beyond_gallery_size():
    from hashgan_tpu.eval.streaming import precision_at_topn_from_hist

    # N > gallery: denominator is the returned count, so the value equals
    # overall relevance fraction.
    n_hist = np.array([[3, 2, 0]])
    r_hist = np.array([[2, 1, 0]])
    got = precision_at_topn_from_hist(n_hist, r_hist, np.array([5, 50]))
    np.testing.assert_allclose(got, [3 / 5, 3 / 5])
