import jax.numpy as jnp
import numpy as np

from hashgan_tpu.ops import hamming_distance_np
from hashgan_tpu.ops.hamming import hamming_scan_topk


def test_approx_mode_high_recall_on_cpu():
    rng = np.random.default_rng(0)
    q = rng.integers(0, 2**32, size=(16, 4), dtype=np.uint32)
    g = rng.integers(0, 2**32, size=(2048, 4), dtype=np.uint32)
    k = 20
    de, ie = hamming_scan_topk(jnp.asarray(q), jnp.asarray(g.T), k=k,
                               slab=512, use_pallas=False, mode="exact")
    da, ia = hamming_scan_topk(jnp.asarray(q), jnp.asarray(g.T), k=k,
                               slab=512, use_pallas=False, mode="approx")
    ie, ia = np.asarray(ie), np.asarray(ia)
    recall = np.mean([len(set(ia[i]) & set(ie[i])) / k for i in range(16)])
    assert recall >= 0.9  # CPU lowering is near-exact; bound loosely
    # distances of approx results must be genuine distances
    d_full = hamming_distance_np(q, g)
    for i in range(16):
        np.testing.assert_array_equal(np.asarray(da)[i], d_full[i][ia[i]])


def test_approx_mode_masks_padding():
    rng = np.random.default_rng(1)
    q = rng.integers(0, 2**32, size=(4, 2), dtype=np.uint32)
    g = rng.integers(0, 2**32, size=(100, 2), dtype=np.uint32)
    gt = jnp.pad(jnp.asarray(g.T), ((0, 0), (0, 28)))  # zero padding
    _, i = hamming_scan_topk(q, gt, k=50, slab=64, use_pallas=False,
                             mode="approx", valid_n=100)
    assert (np.asarray(i) < 100).all()
