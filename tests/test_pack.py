import jax.numpy as jnp
import numpy as np
import pytest

from hashgan_tpu.ops import pack_codes, pack_codes_np, unpack_codes, unpack_codes_np
from hashgan_tpu.ops.pack import pack_codes_jnp


@pytest.mark.parametrize("bits", [32, 48, 64, 96, 128])
def test_pack_np_matches_manual(bits):
    rng = np.random.default_rng(0)
    codes = rng.standard_normal((17, bits)).astype(np.float32)
    packed = pack_codes_np(codes)
    assert packed.shape == (17, (bits + 31) // 32)
    # manual bit check (bits beyond b are distance-neutral zero padding)
    for i in range(17):
        for j in range(packed.shape[1] * 32):
            word, off = divmod(j, 32)
            bit = (int(packed[i, word]) >> off) & 1
            expect = int(codes[i, j] > 0) if j < bits else 0
            assert bit == expect


def test_unpack_roundtrip_np():
    rng = np.random.default_rng(1)
    codes = rng.standard_normal((33, 64)).astype(np.float32)
    packed = pack_codes_np(codes)
    signs = unpack_codes_np(packed, 64)
    np.testing.assert_array_equal(signs, np.where(codes > 0, 1.0, -1.0))


@pytest.mark.parametrize("bits", [32, 48, 64, 128])
def test_pack_jnp_matches_oracle(bits):
    rng = np.random.default_rng(2)
    codes = rng.standard_normal((41, bits)).astype(np.float32)
    got = np.asarray(pack_codes_jnp(jnp.asarray(codes)))
    np.testing.assert_array_equal(got, pack_codes_np(codes))


@pytest.mark.parametrize("bits", [32, 48, 64, 128])
def test_pack_pallas_interpret_matches_oracle(bits):
    rng = np.random.default_rng(3)
    codes = rng.standard_normal((70, bits)).astype(np.float32)  # non-multiple of block
    got = np.asarray(pack_codes(jnp.asarray(codes), block=64, interpret=True))
    np.testing.assert_array_equal(got, pack_codes_np(codes))


def test_unpack_jnp_roundtrip():
    rng = np.random.default_rng(4)
    codes = rng.standard_normal((12, 96)).astype(np.float32)
    packed = pack_codes_jnp(jnp.asarray(codes))
    signs = np.asarray(unpack_codes(packed, 96))
    np.testing.assert_array_equal(signs, np.where(codes > 0, 1.0, -1.0))


def test_pack_zero_is_negative_bit():
    codes = np.zeros((4, 32), dtype=np.float32)
    assert (pack_codes_np(codes) == 0).all()
    got = np.asarray(pack_codes_jnp(jnp.asarray(codes)))
    assert (got == 0).all()
