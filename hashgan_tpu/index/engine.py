"""End-to-end query engine: images (or codes) -> ranked neighbors.

The serving-side composition of the framework: restore an encoder
checkpoint, load (or build) a packed gallery, answer queries on-device.
This is the layer the reference never had (its "querying" lived inside the
numpy MAP evaluator — SURVEY.md §1).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from hashgan_tpu.configs import Config
from hashgan_tpu.index.gallery import PackedGallery
from hashgan_tpu.ops.pack import pack_codes


@dataclasses.dataclass
class QueryResult:
    distances: np.ndarray       # (Q, k) int32 Hamming distances
    indices: np.ndarray         # (Q, k) int32 gallery ids
    labels: Optional[np.ndarray] = None  # (Q, k, n_classes) neighbor labels


class QueryEngine:
    """encode -> pack -> group-min scan, wrapped for serving."""

    def __init__(self, encoder, params, gallery: PackedGallery,
                 cfg: Optional[Config] = None):
        self.encoder = encoder
        self.params = params
        self.gallery = gallery
        # cfg threads the eval-time input geometry (the reference's
        # resize-256 -> center-crop-227 AlexNet protocol) into encoding.
        # encoder=None serves code-only queries (gallery without a model).
        if encoder is not None:
            from hashgan_tpu.train.hash_step import make_encode_fn

            self._encode = make_encode_fn(encoder, cfg)
        else:
            self._encode = None

    @classmethod
    def from_artifacts(
        cls,
        cfg: Config,
        workdir: str,
        gallery_path: str,
        mesh=None,
    ) -> "QueryEngine":
        from hashgan_tpu.train.loop import Experiment

        exp = Experiment(cfg, workdir=workdir, use_mesh=mesh is not None)
        exp.restore_checkpoint()
        gallery = PackedGallery.load(gallery_path, mesh=mesh)
        return cls(exp.encoder, exp.encoder_state.params, gallery, cfg=cfg)

    def encode(self, images_u8: np.ndarray) -> jnp.ndarray:
        if self._encode is None:
            raise ValueError(
                "this QueryEngine was built without an encoder (code-only "
                "serving); query with codes, or construct it with a model"
            )
        return self._encode(self.params, jnp.asarray(images_u8))

    def query_codes(
        self, codes: jnp.ndarray, k: int = 100, mode: str = "exact",
        with_labels: bool = False,
    ) -> QueryResult:
        pq = pack_codes(jnp.asarray(codes, dtype=jnp.float32))
        d, i = self.gallery.topk(pq, k=k, mode=mode)
        d, i = np.asarray(d), np.asarray(i)
        labels = None
        if with_labels:
            # Padding sentinels (index >= n, the documented contract) must
            # not surface a real item's labels: zero their rows instead of
            # clipping into the gallery.
            valid = i < self.gallery.n
            safe = np.where(valid, i, 0)
            labels = np.where(
                valid[:, :, None], self.gallery.labels[safe], 0.0
            ).astype(self.gallery.labels.dtype)
        return QueryResult(distances=d, indices=i, labels=labels)

    def query_images(
        self, images_u8: np.ndarray, k: int = 100, mode: str = "exact",
        with_labels: bool = False,
    ) -> QueryResult:
        return self.query_codes(
            self.encode(images_u8), k=k, mode=mode, with_labels=with_labels
        )


class ServingPipeline:
    """Double-buffered serving: encode -> pack -> MXU scan -> top-k as ONE
    fused jit per batch, dispatched asynchronously with a bounded in-flight
    queue so batch t+1's device work overlaps batch t's result host-copy
    (and, on the remote axon platform, the per-dispatch tunnel latency —
    the dominant single-shot cost; see docs/BENCHMARKS.md serving rows).

    Gallery arrays are jit ARGUMENTS, not closure constants (large device
    constants blow up the axon remote-compile request), and the valid count
    is traced so gallery swaps never recompile.
    """

    def __init__(self, engine: QueryEngine, k: int = 100,
                 mode: str = "exact", depth: int = 2,
                 interpret: bool = False):
        import collections
        import functools

        import jax

        from hashgan_tpu.ops.mxu_large_k import mxu_topk_large
        from hashgan_tpu.ops.mxu_scan import mxu_topk

        gal = engine.gallery
        self._mesh = gal.mesh if (gal.mesh is not None
                                  and gal.mesh.size > 1) else None
        if gal.gallery_grouped is None:
            raise ValueError(
                "gallery has no grouped layout (over-capacity galleries "
                "serve through PackedGallery.topk's slab engine)"
            )
        if self._mesh is None and gal.canon_bg is None:
            raise ValueError(
                "gallery has no grouped layout (over-capacity galleries "
                "serve through PackedGallery.topk's slab engine)"
            )
        if engine._encode is None:
            raise ValueError(
                "ServingPipeline needs an encoder (QueryEngine built "
                "without one serves code queries via query_codes)"
            )
        self.engine = engine
        self.k = k
        self.depth = depth
        encode = engine._encode

        if self._mesh is not None:
            # Mesh serving: the fused step runs the replicated encode and
            # the sharded MXU engine (parallel/sharded_scan.py — per-shard
            # scan, k candidates per chip over ICI, position-key merge)
            # under ONE jit dispatch. Gallery shards stay jit ARGUMENTS so
            # a gallery swap never recompiles.
            from hashgan_tpu.parallel.sharded_scan import (
                sharded_mxu_topk,
                sharded_mxu_topk_large,
            )

            mesh = self._mesh
            # (has_pm8, n) are derived from the CURRENT gallery tuple at
            # each submit (ADVICE r4: a gallery later rebuilt with/without
            # its pm8 bf16 copy, or at a new size, must not hit a compiled
            # step of stale arity); each variant's jit is cached so
            # same-shape gallery swaps still never recompile.
            self._mesh_step_cache = {}

            def build_mesh_step(has_pm8: bool, n: int):
                def mesh_step(params, images_u8, grouped, canon_bg, valids,
                              *pm8):
                    codes = encode(params, images_u8)
                    pq = pack_codes(codes)
                    if k <= 256:
                        return sharded_mxu_topk(
                            mesh, pq, grouped, canon_bg, valids, n=n, k=k,
                            mode=mode, interpret=interpret,
                            gallery_pm8=pm8[0] if has_pm8 else None,
                        )
                    return sharded_mxu_topk_large(
                        mesh, pq, grouped, canon_bg, valids, n=n, k=k,
                        mode=mode, interpret=interpret,
                    )

                return jax.jit(mesh_step)

            self._build_mesh_step = build_mesh_step
        else:
            topk_fn = mxu_topk if k <= 256 else mxu_topk_large
            topk_fn = functools.partial(
                topk_fn, k=k, mode=mode, interpret=interpret
            )

            def step(params, images_u8, gallery_g, canon_bg, valid_n):
                codes = encode(params, images_u8)
                pq = pack_codes(codes)
                return topk_fn(pq, gallery_g, canon_bg, valid_n=valid_n)

            self._step = jax.jit(step)
        self._inflight: "collections.deque" = collections.deque()

    def submit(self, images_u8: np.ndarray) -> None:
        """Dispatch a batch (async); results queue until drained."""
        import jax.numpy as _jnp

        gal = self.engine.gallery
        if self._mesh is not None:
            grouped, _canon, valids, bg, pm8 = gal.gallery_grouped
            key = (pm8 is not None, gal.n)
            step = self._mesh_step_cache.get(key)
            if step is None:
                step = self._mesh_step_cache[key] = \
                    self._build_mesh_step(*key)
            extra = (pm8,) if pm8 is not None else ()
            d, i = step(
                self.engine.params, _jnp.asarray(images_u8),
                grouped, bg, valids, *extra,
            )
        else:
            d, i = self._step(
                self.engine.params, _jnp.asarray(images_u8),
                gal.gallery_grouped, gal.canon_bg, _jnp.int32(gal.n),
            )
        self._inflight.append((d, i))

    def drain(self) -> QueryResult:
        """Force the OLDEST in-flight batch to the host (newer batches keep
        computing on-device while this copy runs)."""
        d, i = self._inflight.popleft()
        return QueryResult(distances=np.asarray(d), indices=np.asarray(i))

    def map_batches(self, batches):
        """Stream batches through the pipeline, yielding results in order
        with at most ``depth`` batches in flight."""
        for b in batches:
            self.submit(b)
            while len(self._inflight) >= self.depth:
                yield self.drain()
        while self._inflight:
            yield self.drain()
