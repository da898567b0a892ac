"""Synthetic dataset-shaped data.

The dev environment has no network (SURVEY.md §7): real CIFAR-10 / NUS-WIDE
downloads are unavailable, so development and CI run on synthetic data with
the same shapes, dtypes, and label semantics. The generator plants a real
class-dependent signal (class-template images + noise) so that hash training
must actually learn something for MAP to rise above chance — this mirrors the
role of the reference's real datasets in its own end-to-end sanity runs.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import numpy as np

from hashgan_tpu.configs import DataConfig


@dataclasses.dataclass
class SyntheticImageDataset:
    """In-memory dataset of uint8 images + 0/1 label matrix.

    ``templates`` carries the per-class generator templates for synthetic
    splits (None for list-file data) — a frozen, training-independent
    classifier for GAN sample-quality metrics hangs off them
    (eval/sample_quality.make_template_classifier)."""

    images: np.ndarray   # (N, H, W, C) uint8
    labels: np.ndarray   # (N, n_classes) float32 0/1
    templates: Optional[np.ndarray] = None  # (K, H, W, C) float32 [0,255]

    def __len__(self) -> int:
        return self.images.shape[0]

    @property
    def n_classes(self) -> int:
        return self.labels.shape[1]


def _class_templates(
    rng: np.random.Generator, n_classes: int, size: int, channels: int
) -> np.ndarray:
    """Smooth per-class template images in [0, 255]."""
    # Low-frequency random fields: draw at low res, upsample by tiling.
    low = max(4, size // 8)
    t = rng.uniform(0.0, 255.0, size=(n_classes, low, low, channels))
    reps = (size + low - 1) // low
    t = np.kron(t, np.ones((1, reps, reps, 1)))[:, :size, :size, :]
    return t.astype(np.float32)


def make_synthetic(
    n: int,
    n_classes: int,
    size: int = 32,
    channels: int = 3,
    multi_label: bool = False,
    noise_scale: float = 40.0,
    seed: int = 0,
    templates: Optional[np.ndarray] = None,
    device: bool = False,
) -> Tuple[SyntheticImageDataset, np.ndarray]:
    """Generate n images with class-dependent content.

    Returns (dataset, templates) so that multiple splits can share templates
    (train/query/database must come from the same "distribution").

    ``device=True`` routes the heavy work (template composition + Gaussian
    noise) through jax on the default backend — see _make_synthetic_device.
    The two paths share template bits but draw labels/noise from different
    (each deterministic) streams: distribution-equal, not bit-equal.
    """
    if device:
        return _make_synthetic_device(
            n, n_classes, size=size, channels=channels,
            multi_label=multi_label, noise_scale=noise_scale, seed=seed,
            templates=templates,
        )
    rng = np.random.default_rng(seed)
    if templates is None:
        templates = _class_templates(rng, n_classes, size, channels)

    if multi_label:
        # 1-3 active labels per example (NUS-WIDE-like). Each active concept
        # renders into its own spatial region (like objects in a scene) —
        # averaging templates instead washes the signal out to near-chance.
        labels = np.zeros((n, n_classes), dtype=np.float32)
        counts = rng.integers(1, 4, size=n)
        base = np.zeros((n, size, size, channels), dtype=np.float32)
        half = size // 2
        quads = [(0, 0), (0, half), (half, 0), (half, half)]
        for i in range(n):
            idx = rng.choice(n_classes, size=counts[i], replace=False)
            labels[i, idx] = 1.0
            base[i] = templates[idx[0]]  # first concept fills the canvas
            for j, cls in enumerate(idx[1:]):
                y, x = quads[int(rng.integers(0, 4))] if counts[i] > 3 else quads[j + 1]
                base[i, y : y + half, x : x + half] = (
                    templates[cls][y : y + half, x : x + half]
                )
    else:
        cls = rng.integers(0, n_classes, size=n)
        labels = np.eye(n_classes, dtype=np.float32)[cls]
        base = templates[cls]

    # float32 + chunking: the dev host has one CPU core, and float64 noise
    # for a 100k x 64px split costs many minutes; f32 halves it and chunking
    # bounds the working set.
    images = np.empty(base.shape, dtype=np.uint8)
    chunk = max(1, (1 << 27) // (base.shape[1] * base.shape[2] * base.shape[3]))
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        noise = rng.standard_normal(
            size=base[lo:hi].shape, dtype=np.float32
        ) * np.float32(noise_scale)
        images[lo:hi] = np.clip(
            base[lo:hi].astype(np.float32) + noise, 0, 255
        ).astype(np.uint8)
    ds = SyntheticImageDataset(images=images, labels=labels,
                               templates=templates)
    return ds, templates


# Rows per PRNG block AND per device dispatch. FIXED by contract: the noise
# key is fold_in(PRNGKey(seed), block_index), so the block size is part of
# the keyed generation semantics — changing it changes the bits.
_DEVICE_BLOCK = 4096
# Per-split element count (n*H*W*C) above which make_splits auto-routes to
# the device generator. 2^26 f32 normals cost ~95 s on this host's single
# throttled vCPU (measured round 3: 17 s / 12M) — below that the legacy
# numpy path is cheap enough and keeps its historical bits.
_DEVICE_MIN_ELEMS = 1 << 26


def _make_synthetic_device(
    n: int,
    n_classes: int,
    size: int,
    channels: int,
    multi_label: bool,
    noise_scale: float,
    seed: int,
    templates: Optional[np.ndarray],
) -> Tuple[SyntheticImageDataset, np.ndarray]:
    """Device-side split generation: composition + noise on the accelerator.

    Run-scale generation is host-bound on this machine (the single throttled
    vCPU needs ~28 min of standard_normal alone for a 100k x 64px split, and
    VM re-images keep wiping the disk cache), so the heavy parts move to the
    default jax backend: the per-item template gather/compose and the
    Gaussian noise. Host keeps only the tiny parts — templates (bit-identical
    to the numpy path, so the frozen-template classifier is path-independent)
    and the label draw (vectorized numpy, its own deterministic stream).

    Determinism: labels from default_rng(seed + 1_000_003); noise from
    jax.random.fold_in(PRNGKey(seed), block) per fixed _DEVICE_BLOCK rows,
    independent of dispatch chunking. jax threefry bits are platform-stable;
    the f32 normal transform could differ by an ulp across backends, which
    the clip->uint8 rounding makes visible only on exact .5 boundaries —
    the bit-exact disk cache (written once, then always loaded) is the
    cross-backend guarantee for resumed runs.
    """
    import jax
    import jax.numpy as jnp

    if templates is None:
        # Same stream position as the numpy path: a fresh rng's first draws.
        templates = _class_templates(
            np.random.default_rng(seed), n_classes, size, channels)

    lrng = np.random.default_rng(seed + 1_000_003)
    if multi_label:
        # 1-3 active concepts; concept j>=1 overwrites spatial quadrant j
        # (matching the numpy path's scene composition).
        assert n_classes >= 3, (
            f"multi-label device generation draws 3 concept slots per image "
            f"and needs n_classes >= 3 (got {n_classes}); use the numpy path "
            "(HASHGAN_SYNTH_DEVICE=off) for degenerate label spaces"
        )
        counts = lrng.integers(1, 4, size=n).astype(np.int32)
        order = np.argsort(
            lrng.random((n, n_classes)), axis=1
        )[:, :3].astype(np.int32)
        active = (np.arange(3)[None, :] < counts[:, None])
        labels = np.zeros((n, n_classes), dtype=np.float32)
        np.put_along_axis(labels, order, active.astype(np.float32), axis=1)
        idx = order
    else:
        cls = lrng.integers(0, n_classes, size=n).astype(np.int32)
        labels = np.eye(n_classes, dtype=np.float32)[cls]
        counts = np.ones(n, dtype=np.int32)
        idx = np.stack([cls, cls, cls], axis=1)

    half = size // 2
    # (y0, x0) for concepts 2 and 3 — quadrants 1 and 2 of the numpy path.
    quads = ((0, half), (half, 0))

    @jax.jit
    def _block(tmpl, idx_b, counts_b, key_b):
        base = tmpl[idx_b[:, 0]]
        if multi_label:
            iy = jnp.arange(size)[:, None]
            ix = jnp.arange(size)[None, :]
            for j, (y0, x0) in enumerate(quads, start=1):
                region = ((iy >= y0) & (iy < y0 + half)
                          & (ix >= x0) & (ix < x0 + half))
                sel = ((counts_b > j)[:, None, None, None]
                       & region[None, :, :, None])
                base = jnp.where(sel, tmpl[idx_b[:, j]], base)
        noise = jax.random.normal(
            key_b, base.shape, dtype=jnp.float32) * jnp.float32(noise_scale)
        return jnp.clip(base + noise, 0.0, 255.0).astype(jnp.uint8)

    tmpl_dev = jax.device_put(templates)
    key = jax.random.PRNGKey(seed)
    images = np.empty((n, size, size, channels), dtype=np.uint8)
    for b, lo in enumerate(range(0, n, _DEVICE_BLOCK)):
        hi = min(lo + _DEVICE_BLOCK, n)
        pad = _DEVICE_BLOCK - (hi - lo)
        idx_b = np.pad(idx[lo:hi], ((0, pad), (0, 0)))
        counts_b = np.pad(counts[lo:hi], (0, pad))
        out = _block(tmpl_dev, idx_b, counts_b, jax.random.fold_in(key, b))
        images[lo:hi] = np.asarray(out)[: hi - lo]
    ds = SyntheticImageDataset(images=images, labels=labels,
                               templates=templates)
    return ds, templates


_SPLITS = ("train", "query", "database")


def _use_device_gen(cfg: DataConfig) -> bool:
    """Route generation to the device when any split is host-infeasible.

    HASHGAN_SYNTH_DEVICE=on/off overrides; default "auto" flips to the
    device generator when the largest split crosses _DEVICE_MIN_ELEMS.
    The decision is a pure function of (env, geometry), so resumed segments
    of one run always pick the same path (and hence the same cache key)."""
    mode = os.environ.get("HASHGAN_SYNTH_DEVICE", "auto").lower()
    if mode in ("on", "1", "true"):
        return True
    if mode in ("off", "0", "false"):
        return False
    if cfg.multi_label and cfg.n_classes < 3:
        # The device generator draws 3 concept slots per image (see the
        # assert in _make_synthetic_device); degenerate multi-label spaces
        # stay on the numpy path. Still a pure function of cfg, so cache
        # keys and checkpoint provenance remain stable.
        return False
    per_image = cfg.image_size * cfg.image_size * cfg.channels
    largest = max(cfg.n_train, cfg.n_query, cfg.n_database)
    return largest * per_image >= _DEVICE_MIN_ELEMS


def synth_generation_key(cfg: DataConfig, device: Optional[bool] = None) -> str:
    """Stable identifier of the exact bit stream a synthetic geometry
    generates: the keyed fields plus WHICH generator ran (numpy vs the
    ``_dev1`` device path — distribution-equal but bit-different). Used as
    the cache directory name and as checkpoint data-provenance (a resumed
    run must see the same bits; see Experiment.restore_checkpoint)."""
    if device is None:
        device = _use_device_gen(cfg)
    return (
        f"v1_{cfg.image_size}x{cfg.channels}_c{cfg.n_classes}"
        f"_ml{int(cfg.multi_label)}_ns{cfg.noise_scale:g}_s{cfg.seed}"
        f"_n{cfg.n_train}-{cfg.n_query}-{cfg.n_database}"
        + ("_dev1" if device else "")  # device path draws different bits
    )


def _synth_cache_dir(cfg: DataConfig, device: bool = False) -> Optional[str]:
    """Cache directory for this generation geometry, or None if disabled.

    The dev host's single vCPU is ~100x slower than a normal core at bulk
    numpy work (measured round 3: 17 s for 12M f32 normals, 70 s for a
    245 MB fancy-index gather), so regenerating a 50k-image split costs
    tens of minutes — and the segmented ref-horizon runners
    (scripts/run_config{2,4}_ref_horizon.py) pay it once per child process.
    Generation is a pure function of the keyed fields, so a disk cache is
    bit-exact by construction. Opt out with HASHGAN_SYNTH_CACHE=off."""
    import os

    root = os.environ.get("HASHGAN_SYNTH_CACHE", "")
    if root.lower() in ("off", "0", "none"):
        return None
    if not root:
        root = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "..", "runs",
            "synth_cache",
        )
    return os.path.join(
        os.path.abspath(root), synth_generation_key(cfg, device=device)
    )


def _load_cached_splits(path: str) -> Dict[str, SyntheticImageDataset]:
    templates = np.load(os.path.join(path, "templates.npy"))
    return {
        split: SyntheticImageDataset(
            images=np.load(os.path.join(path, f"{split}_images.npy")),
            labels=np.load(os.path.join(path, f"{split}_labels.npy")),
            templates=templates,
        )
        for split in _SPLITS
    }


def _save_cached_splits(
    path: str, out: Dict[str, SyntheticImageDataset]
) -> None:
    """Atomic-ish publish: write to a pid-suffixed tmp dir, rename into
    place, and treat a concurrent winner as success."""
    tmp = f"{path}.tmp{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    np.save(os.path.join(tmp, "templates.npy"), out["train"].templates)
    for split in _SPLITS:
        np.save(os.path.join(tmp, f"{split}_images.npy"), out[split].images)
        np.save(os.path.join(tmp, f"{split}_labels.npy"), out[split].labels)
    try:
        os.replace(tmp, path)
    except OSError:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


def make_splits(cfg: DataConfig) -> Dict[str, SyntheticImageDataset]:
    """Build train/query/database splits.

    If reference-style list files are configured and exist on disk, they are
    loaded (images decoded via PIL); otherwise synthetic splits sharing class
    templates are generated (with a bit-exact disk cache — see
    _synth_cache_dir).
    """
    import os

    if cfg.cifar10_dir:
        from hashgan_tpu.data.cifar10 import make_cifar10_splits

        return make_cifar10_splits(cfg.cifar10_dir, cfg)
    lists = {
        ("train", "train_list"): cfg.train_list,
        ("query", "test_list"): cfg.test_list,
        ("database", "database_list"): cfg.database_list,
    }
    if any(lists.values()):
        # All three splits must be configured AND present: a half-configured
        # setup would crash in open(None) or silently mix synthetic splits
        # into a real-data run.
        problems = [
            f"{field}={path!r}" for (_, field), path in lists.items()
            if path is None or not os.path.exists(path)
        ]
        if problems:
            raise FileNotFoundError(
                "list-file datasets need all of train/test/database lists "
                "configured and on disk; missing: " + ", ".join(problems)
            )
        from hashgan_tpu.data.loader import load_list_dataset

        return {split: load_list_dataset(path, cfg)
                for (split, _), path in lists.items()}

    device = _use_device_gen(cfg)
    cache = _synth_cache_dir(cfg, device=device)
    if device and not cache:
        import warnings

        # The device path's f32 normal->uint8 rounding can differ by an ulp
        # across backends; the bit-exact disk cache (written once, then
        # always loaded) is what makes resumed runs see identical bits.
        warnings.warn(
            "device-side synthetic generation with HASHGAN_SYNTH_CACHE=off: "
            "regenerated splits are only guaranteed bit-identical on the "
            "same backend — resumed runs that switch backends may train on "
            "different data bits. Re-enable the cache for resumable runs.",
            stacklevel=2,
        )
    if cache and os.path.exists(os.path.join(cache, "database_labels.npy")):
        return _load_cached_splits(cache)
    templates = None
    out: Dict[str, SyntheticImageDataset] = {}
    for split, n, seed_off in (
        ("train", cfg.n_train, 0),
        ("query", cfg.n_query, 1),
        ("database", cfg.n_database, 2),
    ):
        ds, templates = make_synthetic(
            max(n, 1),
            cfg.n_classes,
            size=cfg.image_size,
            channels=cfg.channels,
            multi_label=cfg.multi_label,
            noise_scale=cfg.noise_scale,
            seed=cfg.seed + seed_off,
            templates=templates,
            device=device,
        )
        out[split] = ds
    if cache:
        _save_cached_splits(cache, out)
    return out
