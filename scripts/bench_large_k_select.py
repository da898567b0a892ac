"""On-chip micro-benchmark: large-k selection strategies + primitive floors.

Times the exact large-k engine (ops/mxu_large_k.py) at the reference
protocol shape (1M x 128-bit gallery, 1024 queries, k in {1000, 5000} —
MAP@5000 is the reference's protocol R, SURVEY.md §3.3) for each selection
strategy, and separately times the bare XLA selection primitives at the
engine's internal widths so the engine's cost can be attributed:

  - lax.top_k(-x, k)       (variadic key+iota sort: what twolevel uses)
  - lax.sort(x)[:, :k]     (value-only sort: what sortdecode uses)

Methodology matches bench_scan.py: every repetition runs inside ONE jitted
lax.scan dispatch and syncs via a 4-byte checksum host copy (the axon
tunnel makes per-dispatch timing unreliable and large host->device
transfers slow, so primitive inputs are generated on-device).

Run on the real chip ONLY when no other axon process is attached
(CLAUDE.md: one tunnel client at a time):
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_large_k_select.py
Prints one JSON object; paste the numbers into docs/BENCHMARKS.md.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from hashgan_tpu.bench_scan import _time_amortized
from hashgan_tpu.ops.groupmin import to_grouped_layout
from hashgan_tpu.ops.mxu_large_k import mxu_topk_large
from hashgan_tpu.ops.mxu_scan import to_group_major

BITS = 128
N = 1 << 20
Q = 1024
BATCHES = 4


def main() -> None:
    rng = np.random.default_rng(0)
    w = BITS // 32
    pg = rng.integers(0, 2**32, size=(N, w), dtype=np.uint32)
    gallery_g = jax.device_put(jnp.asarray(to_grouped_layout(pg)))
    bg = to_group_major(pg)
    canon_bg = jax.device_put(jnp.asarray(bg.reshape(bg.shape[0], -1)))
    qs = jax.device_put(jnp.asarray(
        rng.integers(0, 2**32, size=(BATCHES, Q, w), dtype=np.uint32)))

    out = {"backend": jax.default_backend(), "n": N, "q": Q, "bits": BITS}

    import os

    engine_ks = () if os.environ.get("SKIP_ENGINE") else (1000, 5000)
    for k in engine_ks:
        for sel in ("twolevel", "sortdecode"):
            dt = _time_amortized(
                lambda pq, k=k, sel=sel: mxu_topk_large(
                    pq, gallery_g, canon_bg, valid_n=N, k=k, select=sel,
                )[0].sum().astype(jnp.float32),
                qs, iters=3,
            )
            out[f"k{k}_{sel}_ms"] = round(dt * 1e3, 2)
            out[f"k{k}_{sel}_cmp_per_sec_e9"] = round(Q * N / dt / 1e9, 2)
            print(json.dumps(out), flush=True)

    # Primitive floors at the engine's internal widths: stage-1 minima
    # (65536 = r_sub * c at sigma=16) and stage-2 rescan (k * sigma).
    # The input is generated on-device and passed to the timing jit as an
    # ARGUMENT (a closure constant this size blows up the remote-compile
    # request: HTTP 413 at ~268 MB — CLAUDE.md); a per-rep scalar offset
    # defeats CSE while costing one fused add.
    import time as _time

    reps = jnp.arange(BATCHES, dtype=jnp.int32)

    def time_prim(f, x):
        @jax.jit
        def run(x_, rs):
            def body(acc, r):
                return acc + f(x_, r), None
            o, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), rs)
            return o

        _ = np.asarray(run(x, reps))  # compile + warmup
        best = float("inf")
        for _i in range(3):
            t0 = _time.perf_counter()
            _ = np.asarray(run(x, reps))
            best = min(best, _time.perf_counter() - t0)
        return best / BATCHES

    for width, k in ((65536, 5000), (80000, 5000), (65536, 1000),
                     (16000, 1000)):
        x = jax.jit(
            lambda width=width: jax.random.randint(
                jax.random.key(width), (Q, width), 0, 1 << 28,
                dtype=jnp.int32),
        )()

        def f_topk(x_, r, k=k):
            v, i = jax.lax.top_k(-(x_ + r), k)
            return v.sum().astype(jnp.float32) + i.sum().astype(jnp.float32)

        def f_sort(x_, r, k=k):
            return jax.lax.sort(
                x_ + r, dimension=1, is_stable=False,
            )[:, :k].sum().astype(jnp.float32)

        for name, f in (("topk", f_topk), ("sortonly", f_sort)):
            dt = time_prim(f, x)
            out[f"prim_{name}_w{width}_k{k}_ms"] = round(dt * 1e3, 2)
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
