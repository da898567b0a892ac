"""Hamming-scan throughput benchmark (BASELINE.json north star).

Target: >= 1e9 packed-code comparisons/sec/chip on one v5e. One comparison
= one (query, gallery-item) pair: W uint32 XOR + popcounts + selection
maintenance. The benchmark times the REAL query path — streaming slab scan
+ top-k merge over a device-resident 1M x 128-bit gallery.

Two selection modes (ops/hamming.py):
  exact  — lax.top_k merge, bit-identical to the numpy oracle (eval path)
  approx — lax.approx_min_k (XLA ApproxTopK, the TPU-KNN serving op),
           every comparison still computed; recall ~0.99 @ k=100

Timing note: device sync uses a host copy of the result — on the
experimental ``axon`` platform ``block_until_ready`` can return before the
remote execution has finished.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _time_scan(fn, iters: int) -> float:
    _ = np.asarray(fn()[0])  # compile + warmup, forced to host
    times = []
    for _i in range(iters):
        t0 = time.perf_counter()
        out = fn()
        _ = np.asarray(out[0])  # host copy = reliable device sync
        times.append(time.perf_counter() - t0)
    return min(times)


def run_bench(
    bits: int = 128,
    n: int = 1 << 20,
    q: int = 1024,
    k: int = 100,
    slab: int = 1 << 16,
    iters: int = 3,
    use_pallas: bool | None = None,
) -> Dict:
    from hashgan_tpu.ops.hamming import hamming_scan_topk

    rng = np.random.default_rng(0)
    w = (bits + 31) // 32
    packed_q = jax.device_put(
        jnp.asarray(rng.integers(0, 2**32, size=(q, w), dtype=np.uint32))
    )
    gallery_t = jax.device_put(
        jnp.asarray(rng.integers(0, 2**32, size=(w, n), dtype=np.uint32))
    )

    def scan(mode):
        return hamming_scan_topk(
            packed_q, gallery_t, k=k, slab=slab, use_pallas=use_pallas,
            mode=mode,
        )

    dt_approx = _time_scan(lambda: scan("approx"), iters)
    dt_exact = _time_scan(lambda: scan("exact"), iters)

    # recall of approx vs exact on a query subsample
    _, ie = scan("exact")
    _, ia = scan("approx")
    ie, ia = np.asarray(ie), np.asarray(ia)
    sample = min(128, q)
    recall = float(
        np.mean([len(set(ia[i]) & set(ie[i])) / k for i in range(sample)])
    )

    comparisons = q * n
    cps = comparisons / dt_approx
    return {
        "metric": "packed_hamming_cmp_per_sec",
        "value": float(cps),
        "unit": "cmp/s",
        "vs_baseline": float(cps / 1e9),
        "detail": {
            "bits": bits, "gallery": n, "queries": q, "k": k, "slab": slab,
            "seconds_per_scan_approx": dt_approx,
            "seconds_per_scan_exact": dt_exact,
            "exact_cmp_per_sec": float(comparisons / dt_exact),
            "approx_recall_at_k": recall,
            "backend": jax.default_backend(),
        },
    }


if __name__ == "__main__":
    import json

    print(json.dumps(run_bench()))
