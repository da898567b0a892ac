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
        from hashgan_tpu.train.hash_step import make_encode_fn

        self.encoder = encoder
        self.params = params
        self.gallery = gallery
        # cfg threads the eval-time input geometry (the reference's
        # resize-256 -> center-crop-227 AlexNet protocol) into encoding.
        self._encode = make_encode_fn(encoder, cfg)

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
