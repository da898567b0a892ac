"""HBM-resident packed Hamming gallery: build, persist, query.

This is the first-class index layer the reference lacks (SURVEY.md §1
"notable"): the reference recomputes float code matrices in numpy per eval;
here the gallery is a device-resident uint32 artifact built once (encode ->
Pallas sign/bitpack), stored in scan layout (W, N) for the XOR-popcount
kernel, optionally sharded over a mesh's ``data`` axis, and persisted/
reloaded via utils/checkpoint.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hashgan_tpu.ops.hamming import hamming_scan_topk
from hashgan_tpu.ops.pack import pack_codes
from hashgan_tpu.parallel.sharded_scan import sharded_hamming_topk


@dataclasses.dataclass
class PackedGallery:
    """gallery_t: (W, N_pad) uint32 scan-layout codes (device array);
    labels: (N, K) host float32; n: true item count; bits: logical width."""

    gallery_t: jnp.ndarray
    labels: np.ndarray
    n: int
    bits: int
    mesh: Optional[Mesh] = None

    @property
    def words(self) -> int:
        return self.gallery_t.shape[0]

    def topk(
        self, packed_q: jnp.ndarray, k: int = 100,
        slab: int = 1 << 17, use_pallas: bool | None = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Top-k scan; entries with index >= n are padding sentinels."""
        if self.mesh is not None and self.mesh.size > 1:
            return sharded_hamming_topk(
                self.mesh, packed_q, self.gallery_t, k=k, slab=slab,
                use_pallas=use_pallas, valid_n=self.n,
            )
        return hamming_scan_topk(
            packed_q, self.gallery_t, k=k, slab=slab, use_pallas=use_pallas,
            valid_n=self.n,
        )

    def save(self, path: str) -> None:
        from hashgan_tpu.utils.checkpoint import save_gallery

        packed = np.asarray(self.gallery_t).T[: self.n]  # canonical (N, W)
        save_gallery(path, packed, self.labels, self.bits)

    @classmethod
    def load(cls, path: str, mesh: Optional[Mesh] = None) -> "PackedGallery":
        from hashgan_tpu.utils.checkpoint import load_gallery

        packed, labels, bits = load_gallery(path)
        return build_gallery_from_packed(packed, labels, bits, mesh=mesh)


def build_gallery_from_packed(
    packed: np.ndarray,
    labels: np.ndarray,
    bits: int,
    mesh: Optional[Mesh] = None,
) -> PackedGallery:
    """(N, W) canonical packed codes -> device-resident scan-layout gallery.

    Pads N to a mesh-divisible multiple with all-zero words; the scan masks
    padding by index, and the sharded path requires divisibility.
    """
    n, w = packed.shape
    mult = (mesh.size if mesh is not None else 1) * 8
    n_pad = ((n + mult - 1) // mult) * mult
    if n_pad != n:
        packed = np.concatenate(
            [packed, np.zeros((n_pad - n, w), dtype=np.uint32)], axis=0
        )
    gallery_t = jnp.asarray(packed.T)
    if mesh is not None:
        gallery_t = jax.device_put(
            gallery_t, NamedSharding(mesh, P(None, "data"))
        )
    return PackedGallery(
        gallery_t=gallery_t, labels=np.asarray(labels), n=n, bits=bits, mesh=mesh
    )


def build_gallery(
    codes: jnp.ndarray,
    labels: np.ndarray,
    bits: int,
    mesh: Optional[Mesh] = None,
    use_pallas: bool | None = None,
) -> PackedGallery:
    """Continuous codes (N, bits) -> packed gallery (sign + bitpack on device)."""
    packed = np.asarray(pack_codes(codes, use_pallas=use_pallas))
    return build_gallery_from_packed(packed, labels, bits, mesh=mesh)
