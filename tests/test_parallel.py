import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hashgan_tpu.ops import hamming_distance_np
from hashgan_tpu.parallel import make_mesh, replicate, shard_batch, sharded_hamming_topk


def test_forced_cpu_grid_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_sharded_topk_matches_single_chip(n_dev):
    mesh = make_mesh(n_dev)
    rng = np.random.default_rng(n_dev)
    q = rng.integers(0, 2**32, size=(12, 2), dtype=np.uint32)
    n = 512  # divisible by 8
    g = rng.integers(0, 2**32, size=(n, 2), dtype=np.uint32)
    k = 23
    d, i = sharded_hamming_topk(
        mesh, jnp.asarray(q), jnp.asarray(g.T), k=k, slab=64, use_pallas=False
    )
    d, i = np.asarray(d), np.asarray(i)
    d_full = hamming_distance_np(q, g)
    for qi in range(q.shape[0]):
        order = np.argsort(d_full[qi], kind="stable")[:k]
        np.testing.assert_array_equal(i[qi], order)
        np.testing.assert_array_equal(d[qi], d_full[qi][order])


def test_sharded_topk_heavy_ties(n_dev=4):
    mesh = make_mesh(n_dev)
    rng = np.random.default_rng(0)
    q = rng.integers(0, 2**32, size=(5, 1), dtype=np.uint32) & np.uint32(0x3)
    g = rng.integers(0, 2**32, size=(256, 1), dtype=np.uint32) & np.uint32(0x3)
    d, i = sharded_hamming_topk(
        mesh, jnp.asarray(q), jnp.asarray(g.T), k=50, slab=32, use_pallas=False
    )
    d_full = hamming_distance_np(q, g)
    for qi in range(5):
        order = np.argsort(d_full[qi], kind="stable")[:50]
        np.testing.assert_array_equal(np.asarray(i)[qi], order)


def test_shard_batch_and_replicate():
    mesh = make_mesh(8)
    x = np.arange(64, dtype=np.float32).reshape(16, 4)
    xs = shard_batch(mesh, {"x": x})["x"]
    assert xs.sharding.spec == jax.sharding.PartitionSpec("data", None)
    np.testing.assert_array_equal(np.asarray(xs), x)
    p = replicate(mesh, {"w": np.ones(3)})["w"]
    assert p.sharding.spec == jax.sharding.PartitionSpec()
