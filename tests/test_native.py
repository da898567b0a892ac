import numpy as np
import pytest

from hashgan_tpu.ops import hamming_distance_np, pack_codes_np
from hashgan_tpu.ops.native import (
    available,
    hamming_distance_native,
    hamming_topk_native,
    pack_codes_native,
)

pytestmark = pytest.mark.skipif(not available(), reason="no C++ toolchain")


def test_native_distance_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    q = rng.integers(0, 2**32, size=(13, 4), dtype=np.uint32)
    g = rng.integers(0, 2**32, size=(257, 4), dtype=np.uint32)
    np.testing.assert_array_equal(
        hamming_distance_native(q, g), hamming_distance_np(q, g)
    )


def test_native_topk_matches_stable_argsort():
    rng = np.random.default_rng(1)
    q = rng.integers(0, 2**32, size=(7, 2), dtype=np.uint32)
    g = rng.integers(0, 2**32, size=(500, 2), dtype=np.uint32) & np.uint32(0xFF)
    k = 40
    d, i = hamming_topk_native(q, g, k)
    full = hamming_distance_np(q, g)
    for qi in range(7):
        order = np.argsort(full[qi], kind="stable")[:k]
        np.testing.assert_array_equal(i[qi], order)
        np.testing.assert_array_equal(d[qi], full[qi][order])


def test_native_topk_k_exceeds_n():
    rng = np.random.default_rng(2)
    q = rng.integers(0, 2**32, size=(2, 1), dtype=np.uint32)
    g = rng.integers(0, 2**32, size=(5, 1), dtype=np.uint32)
    d, i = hamming_topk_native(q, g, 8)
    assert (i[:, 5:] == 5).all()
    assert (d[:, 5:] == np.iinfo(np.int32).max).all()


def test_native_pack_matches_numpy():
    rng = np.random.default_rng(3)
    for bits in (32, 48, 128):
        codes = rng.standard_normal((21, bits)).astype(np.float32)
        np.testing.assert_array_equal(
            pack_codes_native(codes), pack_codes_np(codes)
        )


def test_native_speed_vs_numpy_oracle():
    """The point of the native scanner: verify TPU engines at scales where
    the numpy oracle is too slow."""
    import time

    rng = np.random.default_rng(4)
    q = rng.integers(0, 2**32, size=(16, 4), dtype=np.uint32)
    g = rng.integers(0, 2**32, size=(200_000, 4), dtype=np.uint32)
    t0 = time.perf_counter()
    hamming_topk_native(q, g, 100)
    dt = time.perf_counter() - t0
    # 3.2M comparisons; should take well under a second natively
    assert dt < 5.0
