import jax.numpy as jnp
import numpy as np
import pytest

from hashgan_tpu.ops import hamming_distance_np
from hashgan_tpu.parallel import make_mesh
from hashgan_tpu.parallel.sharded_scan import (
    shard_grouped_gallery,
    sharded_groupmin_topk,
)


@pytest.mark.parametrize("n_dev,n", [(2, 1000), (4, 515), (8, 2048)])
def test_sharded_groupmin_matches_oracle(n_dev, n):
    mesh = make_mesh(n_dev)
    rng = np.random.default_rng(n_dev + n)
    pg = rng.integers(0, 2**32, size=(n, 2), dtype=np.uint32)
    pq = rng.integers(0, 2**32, size=(9, 2), dtype=np.uint32)
    grouped, canon, valids, canon_bg, n_loc = shard_grouped_gallery(
        mesh, pg, groups=4, col_multiple=16
    )
    k = 31
    d, i, fb = sharded_groupmin_topk(
        mesh, jnp.asarray(pq), grouped, canon, valids, n=n, k=k,
        repair=16, interpret=True, query_tile=8, col_block=16,
    )
    d, i, fb = np.asarray(d), np.asarray(i), np.asarray(fb)
    d_full = hamming_distance_np(pq, pg)
    for qi in range(9):
        if fb[qi]:
            continue
        order = np.argsort(d_full[qi], kind="stable")[:k]
        np.testing.assert_array_equal(i[qi][: len(order)], order)
        np.testing.assert_array_equal(d[qi][: len(order)], d_full[qi][order])


def test_sharded_groupmin_zero_query_vs_zero_padding():
    """Zero-word padding at shard tails must never win for a zero query."""
    mesh = make_mesh(4)
    rng = np.random.default_rng(0)
    n = 300  # pads to 4 shards x 128 = 512
    pg = rng.integers(1, 2**32, size=(n, 1), dtype=np.uint32)
    pq = np.zeros((3, 1), dtype=np.uint32)
    grouped, canon, valids, _bg, _ = shard_grouped_gallery(
        mesh, pg, groups=4, col_multiple=32
    )
    d, i, fb = sharded_groupmin_topk(
        mesh, jnp.asarray(pq), grouped, canon, valids, n=n, k=20,
        repair=20, interpret=True, query_tile=8, col_block=32,
    )
    i = np.asarray(i)
    assert (i < n).all()
    d_full = hamming_distance_np(pq, pg)
    for qi in range(3):
        if np.asarray(fb)[qi]:
            continue
        order = np.argsort(d_full[qi], kind="stable")[:20]
        np.testing.assert_array_equal(i[qi], order)


def test_sharded_groupmin_approx_mode():
    mesh = make_mesh(4)
    rng = np.random.default_rng(7)
    n = 1024
    pg = rng.integers(0, 2**32, size=(n, 2), dtype=np.uint32)
    pq = rng.integers(0, 2**32, size=(6, 2), dtype=np.uint32)
    grouped, canon, valids, _bg, _ = shard_grouped_gallery(
        mesh, pg, groups=4, col_multiple=16
    )
    d, i, fb = sharded_groupmin_topk(
        mesh, jnp.asarray(pq), grouped, canon, valids, n=n, k=20,
        repair=8, interpret=True, query_tile=8, col_block=16, exact=False,
    )
    d, i = np.asarray(d), np.asarray(i)
    assert (i < n).all()
    # group-min preliminary selection: high recall vs exact on random data
    d_full = hamming_distance_np(pq, pg)
    rec = np.mean([
        len(set(i[qi]) & set(np.argsort(d_full[qi], kind="stable")[:20])) / 20
        for qi in range(6)
    ])
    assert rec > 0.8
