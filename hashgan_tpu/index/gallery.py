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

# HBM budget for the optional ±1 int8 scan copy of a single-chip gallery.
PM8_BUDGET_BYTES = 512 * 1024 * 1024


@dataclasses.dataclass
class PackedGallery:
    """gallery_t: (W, N_pad) uint32 scan-layout codes (device array);
    labels: (N, K) host float32; n: true item count; bits: logical width.

    On TPU the default engine is the MXU matmul-distance scan — EXACT
    (stable-argsort semantics), no fallback path, data-independent latency:
    winner-column rescan for k <= 256 (ops/mxu_scan.py), subgroup-min +
    counting select for larger k up to the MAP@5000 protocol shape
    (ops/mxu_large_k.py). An explicit ``repair`` selects the legacy
    group-min engine (ops/groupmin.py). Mesh galleries run the sharded
    variants with an ICI position-key merge."""

    gallery_t: jnp.ndarray
    labels: np.ndarray
    n: int
    bits: int
    mesh: Optional[Mesh] = None
    gallery_grouped: Optional[jnp.ndarray] = None   # (W, L, C) grouped layout
    packed_canonical: Optional[jnp.ndarray] = None  # (L*C, W) device canonical
    canon_bg: Optional[jnp.ndarray] = None          # (C, L*W) group-major rows
    gallery_pm8: Optional[jnp.ndarray] = None       # (B, NB, L, cb) ±1 int8
    # (gallery_gs, canon_bgs, valids, slab_items) — per-slab rebased-key
    # layouts for single-chip galleries past the int32 composite ceiling
    # (ops/slab_scan.py); None when the single grouped layout fits.
    gallery_slabbed: Optional[tuple] = None

    @property
    def words(self) -> int:
        return self.gallery_t.shape[0]

    def topk(
        self, packed_q: jnp.ndarray, k: int = 100,
        slab: int = 1 << 17, use_pallas: bool | None = None,
        mode: str = "exact", repair: Optional[int] = None,
        large_k_max: int = 8192,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Top-k scan; entries with index >= n are padding sentinels.

        mode: "exact" (default, oracle-bit-identical) or "approx"
        (ApproxTopK selection, ~0.998 recall@100, for latency-critical
        serving).

        repair: group-min rescan capacity. Defaults to k — at which the
        sort-engine fallback is *provably unreachable* (flagged groups are a
        subset of the k groups whose min1 <= the k-th best key, of which
        there are exactly k since composite keys are distinct), so serving
        latency never cliffs and no host sync happens. Smaller values trade
        rescan cost for a (host-synced) fallback check.

        large_k_max: deepest k served by the subgroup-min MXU engine
        (ops/mxu_large_k.py), whose rescan materializes O(Q*k) winner
        subgroups — comfortably covering the MAP@5000 protocol shape.
        Deeper queries (full-ranking / deep PR curves) stream through the
        slab-sort engine instead of materializing the gather."""
        if use_pallas is None:
            import jax as _jax

            use_pallas = _jax.default_backend() not in ("cpu",)
        if self.mesh is not None and self.mesh.size > 1:
            if use_pallas and self.gallery_grouped is not None:
                grouped, canon, valids, canon_bg, pm8 = self.gallery_grouped
                if repair is None and k <= 256:
                    # Flagship multi-chip engine: per-shard MXU scan +
                    # winner rescan, position-key ICI merge. Exact, no
                    # fallback, data-independent latency.
                    from hashgan_tpu.parallel.sharded_scan import (
                        sharded_mxu_topk,
                    )

                    return sharded_mxu_topk(
                        self.mesh, packed_q, grouped, canon_bg, valids,
                        n=self.n, k=k, mode=mode, gallery_pm8=pm8,
                    )
                if repair is None and k <= large_k_max:
                    # Large-k multi-chip engine: per-shard subgroup-min MXU
                    # scan (ops/mxu_large_k.py) + counting-select merge.
                    from hashgan_tpu.parallel.sharded_scan import (
                        sharded_mxu_topk_large,
                    )

                    return sharded_mxu_topk_large(
                        self.mesh, packed_q, grouped, canon_bg, valids,
                        n=self.n, k=k, mode=mode,
                    )
                if repair is None:
                    # k past large_k_max: stream via the sharded sort-merge
                    # engine rather than materializing the winner rescan.
                    return sharded_hamming_topk(
                        self.mesh, packed_q, self.gallery_t, k=k, slab=slab,
                        use_pallas=use_pallas, valid_n=self.n,
                    )
                from hashgan_tpu.parallel.sharded_scan import (
                    sharded_groupmin_topk,
                )

                kk_loc = min(k, canon.shape[1])
                rep = min(repair, kk_loc)
                d, i, fb = sharded_groupmin_topk(
                    self.mesh, packed_q, grouped, canon, valids,
                    n=self.n, k=k, repair=rep,
                    exact=(mode == "exact"),
                )
                if mode == "exact" and rep < kk_loc and bool(jnp.any(fb)):
                    fb_host = np.asarray(fb)
                    d_fix, i_fix = sharded_hamming_topk(
                        self.mesh, packed_q[jnp.asarray(fb_host)],
                        self.gallery_t, k=min(k, self.n), slab=slab,
                        use_pallas=use_pallas, valid_n=self.n,
                    )
                    d = jnp.asarray(np.asarray(d))
                    i = jnp.asarray(np.asarray(i))
                    d = d.at[jnp.asarray(fb_host), : d_fix.shape[1]].set(d_fix)
                    i = i.at[jnp.asarray(fb_host), : i_fix.shape[1]].set(i_fix)
                return d, i
            return sharded_hamming_topk(
                self.mesh, packed_q, self.gallery_t, k=k, slab=slab,
                use_pallas=use_pallas, valid_n=self.n,
            )
        if (use_pallas and self.canon_bg is not None
                and self.gallery_grouped is not None and repair is None
                and k <= large_k_max):
            if k <= 256:
                # Flagship single-chip engine: MXU matmul distances +
                # winner-column rescan — exact with data-independent latency
                # (or ApproxTopK group-minima selection in approx mode). An
                # explicit ``repair`` falls through to the legacy
                # group-min/min2 engine.
                from hashgan_tpu.ops.mxu_scan import mxu_topk

                return mxu_topk(
                    packed_q, self.gallery_grouped, self.canon_bg,
                    valid_n=self.n, k=k, mode=mode,
                    gallery_pm8=self.gallery_pm8,
                )
            # Large-k engine (k up to thousands — the reference protocol's
            # MAP@5000 shape): same scan at subgroup granularity + winner-
            # subgroup rescan + counting select (ops/mxu_large_k.py). Exact,
            # no fallback path, data-independent latency.
            from hashgan_tpu.ops.mxu_large_k import mxu_topk_large

            return mxu_topk_large(
                packed_q, self.gallery_grouped, self.canon_bg,
                valid_n=self.n, k=k, mode=mode,
            )
        if (use_pallas and self.gallery_slabbed is not None
                and repair is None and k <= large_k_max):
            # Past the int32 composite ceiling: per-slab rebased keys keep
            # the MXU engines exact at any gallery size (ops/slab_scan.py).
            from hashgan_tpu.ops.slab_scan import mxu_topk_slabbed

            gs, bgs, valids, slab_items = self.gallery_slabbed
            return mxu_topk_slabbed(
                packed_q, gs, bgs, valids, n=self.n,
                slab_items=slab_items, k=k, mode=mode,
            )
        if (use_pallas and self.gallery_grouped is not None
                and repair is not None):
            # Legacy group-min/min2 engine, selected by an explicit repair.
            from hashgan_tpu.ops.groupmin import groupmin_topk

            kk = min(k, self.gallery_grouped.shape[1]
                     * self.gallery_grouped.shape[2])
            rep = min(repair, kk)
            d, i, fb = groupmin_topk(
                packed_q, self.gallery_grouped, self.packed_canonical,
                valid_n=self.n, k=k, repair=rep,
                exact=(mode == "exact"),
            )
            if mode == "exact" and rep < kk and bool(jnp.any(fb)):
                # Reachable only with an explicitly reduced repair capacity:
                # recompute flagged queries with the sort-based exact engine.
                fb_host = np.asarray(fb)
                d_fix, i_fix = hamming_scan_topk(
                    packed_q[jnp.asarray(fb_host)], self.gallery_t,
                    k=min(k, self.n), slab=slab, valid_n=self.n,
                    use_pallas=use_pallas,
                )
                d = jnp.asarray(np.asarray(d)); i = jnp.asarray(np.asarray(i))
                d = d.at[jnp.asarray(fb_host)].set(d_fix)
                i = i.at[jnp.asarray(fb_host)].set(i_fix)
            return d, i
        return hamming_scan_topk(
            packed_q, self.gallery_t, k=k, slab=slab, use_pallas=use_pallas,
            valid_n=self.n, mode=mode,
        )

    def canonical_packed(self) -> np.ndarray:
        """(n, W) canonical packed codes (host copy)."""
        return np.asarray(self.gallery_t).T[: self.n]

    def extend(self, codes: jnp.ndarray, labels: np.ndarray,
               use_pallas: bool | None = None) -> "PackedGallery":
        """Append items; returns a NEW gallery (functional, like everything
        else in this framework). New items take ids n..n+m-1; existing ids
        are stable. The scan layouts are rebuilt — they are pure layout
        transforms, and rebuilding keeps the contiguous-id tie-order
        contract exact rather than bolting on tombstones. Single-chip
        galleries rebuild ON DEVICE (only the new items cross the wire —
        host transfers are the slow path on this platform); mesh/slabbed
        galleries take the host path (resharding needs the host anyway)."""
        packed_new = pack_codes(jnp.asarray(codes), use_pallas=use_pallas)
        labels_all = np.concatenate(
            [self.labels[: self.n], np.asarray(labels)], axis=0
        )
        if self._device_resident():
            packed = jnp.concatenate(
                [self.packed_canonical[: self.n], packed_new], axis=0
            )
            return build_gallery_from_packed_device(
                packed, labels_all, self.bits, build_pm8=self._has_pm8()
            )
        packed = np.concatenate(
            [self.canonical_packed(), np.asarray(packed_new)], axis=0
        )
        return build_gallery_from_packed(packed, labels_all, self.bits,
                                         mesh=self.mesh,
                                         build_pm8=self._has_pm8())

    def remove(self, ids) -> Tuple["PackedGallery", np.ndarray]:
        """Delete items; returns (new gallery, id_map) where
        ``id_map[new_id] = old_id``. Ids are reassigned to stay contiguous
        (the exact tie-order contract ranks by database index, so stable
        ids with holes would silently change ranking semantics — the id map
        makes the translation explicit instead). Single-chip galleries
        rebuild on device (a keep-index gather; no gallery host copy)."""
        mask = np.ones(self.n, dtype=bool)
        mask[np.asarray(ids)] = False
        keep = np.flatnonzero(mask)
        labels = self.labels[: self.n][keep]
        if self._device_resident():
            packed = jnp.take(
                self.packed_canonical[: self.n], jnp.asarray(keep), axis=0
            )
            return (
                build_gallery_from_packed_device(
                    packed, labels, self.bits, build_pm8=self._has_pm8()
                ),
                keep,
            )
        packed = self.canonical_packed()[keep]
        return (
            build_gallery_from_packed(packed, labels, self.bits,
                                      mesh=self.mesh,
                                      build_pm8=self._has_pm8()),
            keep,
        )

    def _device_resident(self) -> bool:
        """True when the canonical packed codes live on device and the
        single-chip grouped engine is in play (the incremental-update fast
        path); mesh and over-capacity galleries rebuild via the host."""
        return (
            (self.mesh is None or self.mesh.size == 1)
            and self.packed_canonical is not None
            and self.gallery_slabbed is None
        )

    def _has_pm8(self) -> bool:
        """True if this gallery carries the opt-in ±1 scan copy (rebuilds
        via extend/remove preserve it)."""
        if self.gallery_pm8 is not None:
            return True
        return (isinstance(self.gallery_grouped, tuple)
                and self.gallery_grouped[4] is not None)

    def save(self, path: str) -> None:
        from hashgan_tpu.utils.checkpoint import save_gallery

        save_gallery(path, self.canonical_packed(), self.labels, self.bits)

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
    build_pm8: bool = False,
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
    from hashgan_tpu.ops.groupmin import groupmin_capacity_ok

    gallery_grouped = packed_canonical = canon_bg = gallery_pm8 = None
    gallery_slabbed = None
    if mesh is None or mesh.size == 1:
        if not groupmin_capacity_ok(n, w):
            # Beyond the single-layout int32 key space: per-slab rebased
            # keys keep the MXU engines exact (ops/slab_scan.py) instead of
            # degrading to the sort engine.
            from hashgan_tpu.ops.slab_scan import build_slabbed_layout

            gallery_slabbed = build_slabbed_layout(packed[:n])
        if groupmin_capacity_ok(n, w):
            from hashgan_tpu.ops.groupmin import to_grouped_layout
            from hashgan_tpu.ops.mxu_scan import to_group_major

            grouped = to_grouped_layout(packed[:n], groups=128, col_multiple=256)
            n_tot = grouped.shape[1] * grouped.shape[2]
            canon = np.concatenate(
                [packed[:n], np.zeros((n_tot - n, w), dtype=np.uint32)], axis=0
            )
            gallery_grouped = jnp.asarray(grouped)
            packed_canonical = jnp.asarray(canon)
            bg = to_group_major(packed[:n], groups=128, col_multiple=256)
            canon_bg = jnp.asarray(bg.reshape(bg.shape[0], -1))
            # Optional int8 scan copy (1 byte/code-bit, device-built).
            # MEASURED SLOWER than the in-kernel-unpack engine on v5e
            # (docs/BENCHMARKS.md) — opt-in for hardware with a native-rate
            # int8 MXU, bounded so huge galleries don't eat HBM.
            if build_pm8 and 32 * w * n_tot <= PM8_BUDGET_BYTES:
                from hashgan_tpu.ops.mxu_scan import grouped_to_pm8

                gallery_pm8 = grouped_to_pm8(gallery_grouped)
        # else: beyond the grouped engine's int32 key space — topk falls
        # through to the ceiling-free sort engine (exact, just slower).
    else:
        nd = mesh.size
        if groupmin_capacity_ok(-(-n // nd), w):
            from hashgan_tpu.parallel.sharded_scan import shard_grouped_gallery

            grouped_dev, canon_dev, valids_dev, bg_dev, _ = (
                shard_grouped_gallery(mesh, packed[:n], groups=128,
                                      col_multiple=256)
            )
            pm8_dev = None
            n_loc_tot = grouped_dev.shape[2] * grouped_dev.shape[3]
            if build_pm8 and 32 * w * n_loc_tot <= PM8_BUDGET_BYTES:
                from hashgan_tpu.parallel.sharded_scan import shard_pm8_gallery

                pm8_dev = shard_pm8_gallery(mesh, grouped_dev)
            # mesh galleries store the sharded engine inputs as a tuple
            gallery_grouped = (grouped_dev, canon_dev, valids_dev, bg_dev,
                               pm8_dev)
    return PackedGallery(
        gallery_t=gallery_t, labels=np.asarray(labels), n=n, bits=bits,
        mesh=mesh, gallery_grouped=gallery_grouped,
        packed_canonical=packed_canonical, canon_bg=canon_bg,
        gallery_pm8=gallery_pm8, gallery_slabbed=gallery_slabbed,
    )


def build_gallery_from_packed_device(
    packed: jnp.ndarray,
    labels: np.ndarray,
    bits: int,
    build_pm8: bool = False,
    groups: int = 128,
    col_multiple: int = 256,
) -> PackedGallery:
    """Single-chip gallery build from DEVICE-resident packed codes: every
    layout (scan transpose, grouped, group-major rescan rows) is a pure
    reshape/transpose executed on device, so incremental updates
    (extend/remove) never round-trip the gallery through the host. Produces
    bit-identical layouts to build_gallery_from_packed (asserted in
    tests/test_round3_fixes.py). Falls back to the host builder past the
    grouped capacity (slabbed layouts reshard host-side)."""
    from hashgan_tpu.ops.groupmin import groupmin_capacity_ok

    n, w = packed.shape
    if not groupmin_capacity_ok(n, w, groups, col_multiple):
        return build_gallery_from_packed(
            np.asarray(packed), labels, bits, build_pm8=build_pm8
        )
    n_pad8 = ((n + 7) // 8) * 8
    padded8 = jnp.concatenate(
        [packed, jnp.zeros((n_pad8 - n, w), jnp.uint32)], axis=0
    ) if n_pad8 != n else packed
    gallery_t = padded8.T
    L = groups
    c = -(-n // (L * col_multiple)) * col_multiple
    n_tot = L * c
    canon = jnp.concatenate(
        [packed, jnp.zeros((n_tot - n, w), jnp.uint32)], axis=0
    ) if n_tot != n else packed
    cube = canon.reshape(L, c, w)
    gallery_grouped = cube.transpose(2, 0, 1)               # (W, L, C)
    canon_bg = cube.transpose(1, 0, 2).reshape(c, L * w)    # (C, L*W)
    gallery_pm8 = None
    if build_pm8 and 32 * w * n_tot <= PM8_BUDGET_BYTES:
        from hashgan_tpu.ops.mxu_scan import grouped_to_pm8

        gallery_pm8 = grouped_to_pm8(gallery_grouped)
    return PackedGallery(
        gallery_t=gallery_t, labels=np.asarray(labels), n=n, bits=bits,
        mesh=None, gallery_grouped=gallery_grouped,
        packed_canonical=canon, canon_bg=canon_bg, gallery_pm8=gallery_pm8,
    )


def build_gallery(
    codes: jnp.ndarray,
    labels: np.ndarray,
    bits: int,
    mesh: Optional[Mesh] = None,
    use_pallas: bool | None = None,
    build_pm8: bool = False,
) -> PackedGallery:
    """Continuous codes (N, bits) -> packed gallery (sign + bitpack on device)."""
    packed = np.asarray(pack_codes(codes, use_pallas=use_pallas))
    return build_gallery_from_packed(packed, labels, bits, mesh=mesh,
                                     build_pm8=build_pm8)
