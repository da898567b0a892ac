"""Sign-quantization fused with bit-packing into uint32 lanes.

This replaces the reference's host-side ``np.sign`` + implicit float code
matrices (SURVEY.md §3.3): codes never leave the device, and the packed
gallery is 32x smaller than float codes (b bits -> b/32 uint32 words).

Two implementations sharing the layout contract of ``ops/ref_numpy.py``:

- ``pack_codes_jnp``: pure jnp (shift + segment-sum), runs on any backend,
  used as the CPU fallback and in property tests.
- ``pack_codes`` (Pallas): fused sign->bitpack kernel. The 32-bit word is
  assembled via two exact f32 matmuls on the MXU (bit weights split into
  2^0..2^15 and 2^16-scaled halves, each of which sums exactly within f32's
  24-bit mantissa) then recombined with integer shifts — this avoids
  lane-axis reshapes inside the kernel, which Mosaic lays out poorly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_bit_columns(codes: jnp.ndarray) -> jnp.ndarray:
    """Pad the bit axis to a multiple of 32 with -1 columns.

    A constant-negative column packs to an always-0 bit, which contributes 0
    to every XOR-popcount — Hamming distances are unchanged. This is how
    non-multiple-of-32 code lengths (e.g. the 48-bit BASELINE config) ride
    the uint32-packed engine at zero distance error.
    """
    b = codes.shape[1]
    b_pad = ((b + 31) // 32) * 32
    if b_pad != b:
        codes = jnp.pad(codes, ((0, 0), (0, b_pad - b)), constant_values=-1.0)
    return codes


def pack_codes_jnp(codes: jnp.ndarray) -> jnp.ndarray:
    """(N, b) real codes -> (N, ceil(b/32)) uint32. Bit i of word w = code[32w+i] > 0."""
    codes = _pad_bit_columns(codes)
    n, b = codes.shape
    w = b // 32
    bits = (codes > 0).astype(jnp.uint32)
    shifts = (jnp.arange(b, dtype=jnp.uint32) % 32)[None, :]
    weighted = bits << shifts
    # Words are disjoint bit sets, so the uint32 sum is exact (no overflow).
    return weighted.reshape(n, w, 32).sum(axis=-1, dtype=jnp.uint32)


def unpack_codes(packed: jnp.ndarray, bits: int) -> jnp.ndarray:
    """(N, ceil(b/32)) uint32 -> (N, b) float32 in {-1, +1}."""
    n, w = packed.shape
    assert w * 32 >= bits, f"packed width {w} too small for bits={bits}"
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    b = (packed[:, :, None] >> shifts) & jnp.uint32(1)
    return b.reshape(n, w * 32)[:, :bits].astype(jnp.float32) * 2.0 - 1.0


def _pack_weight_tables(bits: int) -> tuple[np.ndarray, np.ndarray]:
    """(b, b/32) f32 weight matrices for the lo/hi 16-bit halves of each word."""
    w = bits // 32
    lo = np.zeros((bits, w), dtype=np.float32)
    hi = np.zeros((bits, w), dtype=np.float32)
    for i in range(bits):
        word, off = divmod(i, 32)
        if off < 16:
            lo[i, word] = float(1 << off)
        else:
            hi[i, word] = float(1 << (off - 16))
    return lo, hi


def _pack_kernel(codes_ref, wlo_ref, whi_ref, out_ref):
    bits = (codes_ref[:] > 0).astype(jnp.float32)
    lo = jnp.dot(bits, wlo_ref[:], preferred_element_type=jnp.float32)
    hi = jnp.dot(bits, whi_ref[:], preferred_element_type=jnp.float32)
    # Mosaic has no f32->uint32 cast; assemble the word in int32 (hi << 16
    # may wrap into the sign bit — the bit pattern is still exact) and
    # bitcast to uint32 outside the kernel.
    word = lo.astype(jnp.int32) | (hi.astype(jnp.int32) << jnp.int32(16))
    out_ref[:] = word


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _pack_pallas(codes: jnp.ndarray, block: int = 512, interpret: bool = False):
    codes = _pad_bit_columns(codes)
    n, b = codes.shape
    w = b // 32
    wlo, whi = _pack_weight_tables(b)
    n_pad = pl.cdiv(n, block) * block
    if n_pad != n:
        codes = jnp.pad(codes, ((0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        _pack_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, w), jnp.int32),
        grid=(n_pad // block,),
        in_specs=[
            pl.BlockSpec((block, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(codes.astype(jnp.float32), jnp.asarray(wlo), jnp.asarray(whi))
    return jax.lax.bitcast_convert_type(out[:n], jnp.uint32)


def pack_codes(
    codes: jnp.ndarray,
    block: int = 512,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pack real codes to uint32, choosing Pallas on TPU, jnp elsewhere."""
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas or interpret:
        return _pack_pallas(codes, block=block, interpret=interpret)
    return pack_codes_jnp(codes)
