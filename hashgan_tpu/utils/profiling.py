"""Tracing / profiling helpers (SURVEY.md §5 tracing subsystem).

The reference has no profiling beyond wall-clock prints. Here:

- ``trace(logdir)``: context manager around ``jax.profiler`` — produces an
  XProf/Perfetto trace viewable in TensorBoard or ui.perfetto.dev.
- ``time_fn``: wall-clock timing harness with reliable device sync (host
  copy — on the experimental ``axon`` platform ``block_until_ready`` can
  return early, see bench_scan.py).
- ``kernel_throughput``: convenience wrapper reporting achieved bytes/s and
  ops/s against a roofline estimate.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "/tmp/hashgan_tpu_trace"):
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def _force(out) -> None:
    """Reliable device sync: copy one leaf to host."""
    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        np.asarray(leaves[0])


def time_fn(fn: Callable, *args, iters: int = 5, warmup: int = 1, **kwargs) -> float:
    """Best-of-iters wall-clock seconds for fn(*args), device-synced."""
    for _ in range(warmup):
        _force(fn(*args, **kwargs))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _force(fn(*args, **kwargs))
        best = min(best, time.perf_counter() - t0)
    return best


def kernel_throughput(
    fn: Callable,
    *args,
    bytes_accessed: Optional[int] = None,
    ops: Optional[int] = None,
    iters: int = 5,
    **kwargs,
) -> Dict[str, float]:
    dt = time_fn(fn, *args, iters=iters, **kwargs)
    out: Dict[str, float] = {"seconds": dt}
    if bytes_accessed:
        out["gbytes_per_sec"] = bytes_accessed / dt / 1e9
    if ops:
        out["gops_per_sec"] = ops / dt / 1e9
    return out
