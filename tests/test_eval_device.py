import jax.numpy as jnp
import numpy as np
import pytest

from hashgan_tpu.eval import (
    device_map_at_r,
    device_precision_at_radius,
    mean_average_precision_np,
    precision_at_radius_np,
)
from hashgan_tpu.ops import hamming_distance_np


def _random_case(seed, q=30, n=200, words=1, n_classes=4, multi=False):
    rng = np.random.default_rng(seed)
    pq = rng.integers(0, 2**32, size=(q, words), dtype=np.uint32)
    pg = rng.integers(0, 2**32, size=(n, words), dtype=np.uint32)
    if multi:
        qlab = (rng.random((q, n_classes)) < 0.4).astype(np.float32)
        dlab = (rng.random((n, n_classes)) < 0.4).astype(np.float32)
        qlab[qlab.sum(1) == 0, 0] = 1
        dlab[dlab.sum(1) == 0, 0] = 1
    else:
        qlab = np.eye(n_classes, dtype=np.float32)[rng.integers(0, n_classes, q)]
        dlab = np.eye(n_classes, dtype=np.float32)[rng.integers(0, n_classes, n)]
    return pq, pg, qlab, dlab


@pytest.mark.parametrize("seed,multi", [(0, False), (1, True), (2, False)])
def test_device_map_matches_oracle(seed, multi):
    pq, pg, qlab, dlab = _random_case(seed, multi=multi)
    d = hamming_distance_np(pq, pg)
    expect = mean_average_precision_np(d, qlab, dlab, R=50)
    got = float(
        device_map_at_r(
            jnp.asarray(pq), jnp.asarray(pg), jnp.asarray(qlab), jnp.asarray(dlab),
            R=50, query_chunk=16, use_pallas=False,
        )
    )
    assert abs(got - expect) < 1e-5


def test_device_map_heavy_ties_exact_tiebreak():
    # words=1 with masked bits -> massive ties; exactness requires the
    # composite key to reproduce stable-argsort order.
    rng = np.random.default_rng(3)
    pq = (rng.integers(0, 2**32, size=(10, 1), dtype=np.uint32)) & np.uint32(0x7)
    pg = (rng.integers(0, 2**32, size=(300, 1), dtype=np.uint32)) & np.uint32(0x7)
    qlab = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 10)]
    dlab = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 300)]
    d = hamming_distance_np(pq, pg)
    expect = mean_average_precision_np(d, qlab, dlab, R=100)
    got = float(
        device_map_at_r(
            jnp.asarray(pq), jnp.asarray(pg), jnp.asarray(qlab), jnp.asarray(dlab),
            R=100, query_chunk=4, use_pallas=False,
        )
    )
    assert abs(got - expect) < 1e-6


def test_device_map_r_exceeds_n():
    pq, pg, qlab, dlab = _random_case(4, q=8, n=40)
    d = hamming_distance_np(pq, pg)
    expect = mean_average_precision_np(d, qlab, dlab, R=1000)
    got = float(
        device_map_at_r(
            jnp.asarray(pq), jnp.asarray(pg), jnp.asarray(qlab), jnp.asarray(dlab),
            R=1000, use_pallas=False,
        )
    )
    assert abs(got - expect) < 1e-6


def test_device_precision_at_radius_matches_oracle():
    pq, pg, qlab, dlab = _random_case(5, words=2)
    d = hamming_distance_np(pq, pg)
    for radius in (0, 2, 20):
        expect = precision_at_radius_np(d, qlab, dlab, radius=radius)
        got = float(
            device_precision_at_radius(
                jnp.asarray(pq), jnp.asarray(pg), jnp.asarray(qlab),
                jnp.asarray(dlab), radius=radius, use_pallas=False,
            )
        )
        assert abs(got - expect) < 1e-6
