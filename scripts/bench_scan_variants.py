"""Scan-phase kernel experiments (round 4 ceiling attack).

The exact engine's scan phase is 8.4 ms of the 13.9 ms 1M budget at ~17%
of MXU peak — bounded by the VPU epilogue (key FMA + cross-sublane min
over L + decode) serializing against a thin K=128 matmul. This harness
measures focused variants against the production kernel at the headline
shape WITHOUT touching production code:

  prod        ops/mxu_scan.mxu_fullkey_scan as shipped
  bf16dot     MXU output in bf16 (|dot| <= B=128 < 256 => bf16-EXACT for
              ±1 products; halves the dot intermediate's VMEM traffic).
              MEASURED NEGATIVE: Mosaic rejects bf16 matmul accumulators
              ("Expected matmul acc to be 32-bit") — the variant cannot
              compile on v5e; production's bf16-in/f32-acc is the floor.
  lanes       group axis minor: the min reduces over lanes, not sublanes
  tile64/256  query_tile sweep (VMEM-bounded)
  cb64/cb256  col_block sweep (cb256 likely exceeds VMEM: expect failure)

Each variant is oracle-checked against the production scan on a small
probe before timing. Usage (chip free):
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_scan_variants.py
"""

from __future__ import annotations

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hashgan_tpu.bench_scan import _time_amortized
from hashgan_tpu.ops.groupmin import INT32_MAX, to_grouped_layout
from hashgan_tpu.ops.mxu_scan import (
    PAD_PENALTY,
    build_key_base,
    build_key_base_t,
    mxu_fullkey_scan,
    unpack_to_pm1,
)


def _fullkey_kernel_bf16(q_ref, g_ref, base_ref, min_ref, gb_ref, *,
                         half_l, stride, c_total):
    """Production kernel with the dot emitted in bf16 (exact: ±1 products,
    B <= 128 sums — integers < 256 are exact in bf16)."""
    w_words = g_ref.shape[0]
    L = g_ref.shape[1]
    cb = g_ref.shape[2]

    @pl.when(pl.program_id(1) == 0)
    def _unpack():
        for w in range(w_words):
            gw = g_ref[w]
            bitpos = jax.lax.broadcasted_iota(jnp.uint32, (32, L, cb), 0)
            bits = (gw[None, :, :] >> bitpos) & jnp.uint32(1)
            pm = (bits.astype(jnp.int32) * 2 - 1).astype(
                jnp.float32).astype(jnp.bfloat16)
            gb_ref[w * 32: (w + 1) * 32, :] = pm.reshape(32, L * cb)

    dot = jnp.dot(q_ref[:], gb_ref[:], preferred_element_type=jnp.bfloat16)
    key = base_ref[:][None, :, :] - dot.astype(jnp.float32).reshape(
        dot.shape[0], L, cb) * half_l
    colmin = jnp.min(key, axis=1).astype(jnp.int32)
    is_pad = colmin >= jnp.int32(PAD_PENALTY)
    shift = L.bit_length() - 1
    d = jax.lax.shift_right_logical(colmin, shift)
    s = jnp.bitwise_and(colmin, jnp.int32(L - 1))
    cols = (pl.program_id(0) * cb
            + jax.lax.broadcasted_iota(jnp.int32, colmin.shape, 1))
    full = d * jnp.int32(stride) + s * jnp.int32(c_total) + cols
    min_ref[:] = jnp.where(is_pad, INT32_MAX, full)


@functools.partial(jax.jit, static_argnames=(
    "stride", "c_total", "query_tile", "col_block", "interpret"))
def fullkey_scan_bf16(q_pm1, gallery_g, key_base, stride, c_total,
                      query_tile=128, col_block=128, interpret=False):
    q, b = q_pm1.shape
    w, L, c = gallery_g.shape
    q_pad = pl.cdiv(q, query_tile) * query_tile
    if q_pad != q:
        q_pm1 = jnp.pad(q_pm1, ((0, q_pad - q), (0, 0)))
    kernel = functools.partial(
        _fullkey_kernel_bf16, half_l=float(L) / 2.0, stride=stride,
        c_total=c_total)
    full = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((q_pad, c), jnp.int32),
        grid=(c // col_block, q_pad // query_tile),
        in_specs=[
            pl.BlockSpec((query_tile, b), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, L, col_block), lambda j, i: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, col_block), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((query_tile, col_block), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((b, L * col_block), jnp.bfloat16)],
        interpret=interpret,
    )(q_pm1.astype(jnp.bfloat16), gallery_g, key_base)
    return full[:q]


def main(bits=128, n=1 << 20, q=1024, batches=6, iters=3):
    rng = np.random.default_rng(0)
    w = (bits + 31) // 32
    qs_u32 = rng.integers(0, 2**32, size=(batches, q, w), dtype=np.uint32)
    qs = jax.device_put(jnp.asarray(qs_u32))
    pg = rng.integers(0, 2**32, size=(n, w), dtype=np.uint32)
    gallery_g = jax.device_put(jnp.asarray(to_grouped_layout(pg)))
    _, L, c = gallery_g.shape
    stride = L * c + 1
    kb = build_key_base(L, c, bits, n)

    # correctness probe (tiny): every variant == production
    probe = jnp.asarray(qs_u32[0, :8])
    ref = np.asarray(mxu_fullkey_scan(
        unpack_to_pm1(probe), gallery_g, kb, stride=stride, c_total=c)[0])

    results = {}

    def timed(name, fn):
        try:
            dt = _time_amortized(fn, qs, iters=iters)
            results[name] = {"ms": 1e3 * dt,
                             "cmp_per_sec": float(q * n / dt)}
            print(name, json.dumps(results[name]), flush=True)
        except Exception as e:
            results[name] = {"error": repr(e).splitlines()[0][:200]}
            print(name, "FAILED:", results[name]["error"], flush=True)

    timed("prod", lambda pq: mxu_fullkey_scan(
        unpack_to_pm1(pq), gallery_g, kb, stride=stride, c_total=c
    )[0][:, :1].sum().astype(jnp.float32))

    try:
        got = np.asarray(fullkey_scan_bf16(
            unpack_to_pm1(probe), gallery_g, kb, stride, c))
        assert (got == ref).all(), "bf16dot mismatch"
        timed("bf16dot", lambda pq: fullkey_scan_bf16(
            unpack_to_pm1(pq), gallery_g, kb, stride, c
        )[:, :1].sum().astype(jnp.float32))
    except Exception as e:
        results["bf16dot"] = {"error": repr(e).splitlines()[0][:200]}
        print("bf16dot FAILED:", results["bf16dot"]["error"], flush=True)

    # lanes: the PRODUCTION layout="lane" path (ops/mxu_scan.py round 4).
    kb_t = build_key_base_t(L, c, bits, n)
    try:
        got = np.asarray(mxu_fullkey_scan(
            unpack_to_pm1(probe), gallery_g, kb_t, stride=stride, c_total=c,
            layout="lane")[0])
        assert (got == ref).all(), "lanes mismatch"
        timed("lanes", lambda pq: mxu_fullkey_scan(
            unpack_to_pm1(pq), gallery_g, kb_t, stride=stride, c_total=c,
            layout="lane")[0][:, :1].sum().astype(jnp.float32))
    except Exception as e:
        results["lanes"] = {"error": repr(e).splitlines()[0][:200]}
        print("lanes FAILED:", results["lanes"]["error"], flush=True)

    for qt in (64, 256):
        try:
            got = np.asarray(mxu_fullkey_scan(
                unpack_to_pm1(probe), gallery_g, kb, stride=stride,
                c_total=c, query_tile=qt)[0])
            assert (got == ref).all(), f"tile{qt} mismatch"
        except Exception as e:
            results[f"tile{qt}"] = {"error": repr(e).splitlines()[0][:200]}
            print(f"tile{qt} FAILED:", results[f"tile{qt}"]["error"],
                  flush=True)
            continue
        timed(f"tile{qt}", lambda pq, qt=qt: mxu_fullkey_scan(
            unpack_to_pm1(pq), gallery_g, kb, stride=stride, c_total=c,
            query_tile=qt)[0][:, :1].sum().astype(jnp.float32))

    for cb in (64, 256):
        try:
            got = np.asarray(mxu_fullkey_scan(
                unpack_to_pm1(probe), gallery_g, kb, stride=stride,
                c_total=c, col_block=cb)[0])
            assert (got == ref).all(), f"cb{cb} mismatch"
        except Exception as e:
            results[f"cb{cb}"] = {"error": repr(e).splitlines()[0][:200]}
            print(f"cb{cb} FAILED:", results[f"cb{cb}"]["error"], flush=True)
            continue
        timed(f"cb{cb}", lambda pq, cb=cb: mxu_fullkey_scan(
            unpack_to_pm1(pq), gallery_g, kb, stride=stride, c_total=c,
            col_block=cb)[0][:, :1].sum().astype(jnp.float32))

    with open("/tmp/scan_variants.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
