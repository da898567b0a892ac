"""Device-resident training data: HBM-resident splits + in-jit batch gather.

The host pipeline (data/pipeline.py) mirrors the reference's feed
boundary (SURVEY.md §3.5 ``feed_dict``): numpy gathers a batch, the
batch crosses the wire every step. That design pays twice on this
platform (both measured, docs/BENCHMARKS.md round 3):

- the axon tunnel client leaks host memory per TRANSFERRED BYTE
  (~1.15x wire bytes) — a 100k-step run leaked 130 GB and was OOM-killed,
  forcing segmented execution;
- the dev host's single vCPU is ~100x slower than a normal core at bulk
  numpy, so the per-step host gather stalls the device (prefetch is a
  generator, not a thread — it cannot hide host latency).

The TPU-native answer: park the whole split in HBM once (uint8 images —
config4's 50k x 64px database is 614 MB, far under one chip's HBM) and
gather batches ON DEVICE inside one jitted function whose only wire
traffic is the step counter. Sampling is a pure function of
(seed, step) via the JAX PRNG (fold_in), so checkpoint resume replays the
exact data order — the same step-purity contract as the host pipeline
(tests/test_checkpoint.py), with a different (but equally deterministic)
order: the two pipelines are order-compatible only with themselves, so a
run must keep the pipeline it started with.

Epoch-shuffle mode reproduces the reference's shuffle-per-epoch protocol:
a per-epoch ``jax.random.permutation`` (recomputed in-jit — sorting ~13k
keys on-device costs microseconds, so statelessness is free), consumed in
batch_size slices, ragged remainder dropped — the host pipeline's exact
epoch semantics.

``pair_balanced`` sampling (BASELINE config 3, data/pipeline.py
``BatchIterator._partners``) runs in-jit too: the ragged per-class pools
are padded once into a rectangular (n_classes, max_pool) int32 matrix
(NUS-WIDE shape: 21 x <=10.5k = <1 MB of HBM) and partner selection is
three fold_in-seeded draws — anchor, active class via cumsum inversion,
pool member — so config 3 gets the same one-dispatch-per-window training
loop as configs 1/2/4. Same guarantee as the host sampler (second half
partners share >= 1 active label with the first half's anchors; no-label
rows self-partner), same step-purity contract, but a different PRNG —
the two pipelines are order-compatible only with themselves.
"""

from __future__ import annotations

import functools
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hashgan_tpu.data.synthetic import SyntheticImageDataset


def _class_pools(labels: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Rectangular per-class member pools: (pool (K, P) i32, sizes (K,) i32).

    ``pool[c, :sizes[c]]`` lists the item indices whose label ``c`` is
    active; padding slots are 0 (a valid index — callers must bound picks
    by ``sizes``). Built host-side once per split with vectorized numpy
    (no per-class python loop: the dev host's single throttled vCPU)."""
    act = labels > 0.5
    sizes = act.sum(axis=0).astype(np.int32)
    p = max(int(sizes.max()) if sizes.size else 0, 1)
    pool = np.zeros((labels.shape[1], p), np.int32)
    rows, cols = np.nonzero(act.T)  # rows=class ids (sorted), cols=item ids
    if rows.size:
        offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        pool[rows, np.arange(rows.size) - offsets[rows]] = cols
    return pool, sizes


class DeviceBatchSource:
    """Device-resident split yielding step-pure batches without host I/O.

    Yields the same structures the train loops consume:
    ``n_batches=1``: (images (B,H,W,C) u8, labels (B,K) f32);
    ``n_batches>1`` (the fused GAN cycle's critic+gen stack):
    ((n_batches,B,H,W,C), (n_batches,B,K)).

    ``sharding``: optional NamedSharding for the yielded batch (e.g. batch
    dim over the mesh's data axis); the resident split itself is placed
    replicated so every device can gather any row.
    """

    def __init__(
        self,
        dataset: SyntheticImageDataset,
        batch_size: int,
        seed: int = 0,
        epoch_shuffle: bool = False,
        pair_balanced: bool = False,
        n_batches: int = 1,
        sharding=None,
        mesh=None,
    ):
        self.n = len(dataset)
        self.batch_size = batch_size
        self.n_batches = n_batches
        self.seed = seed
        self.epoch_shuffle = epoch_shuffle
        self.pair_balanced = pair_balanced
        total = batch_size * n_batches
        if pair_balanced and n_batches != 1:
            # Balance is a WML-loss (encoder stage) contract; the fused GAN
            # cycle's stacked batches train the critic/generator and take
            # the plain samplers.
            raise ValueError("pair_balanced requires n_batches == 1")
        if mesh is not None:
            # Replicate the split so per-device gathers need no collective.
            rep = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()
            )
            put = lambda x: jax.device_put(x, rep)  # noqa: E731
        else:
            put = jax.device_put
        self.images = put(dataset.images)
        self.labels = put(dataset.labels)
        if pair_balanced:
            pool, sizes = _class_pools(dataset.labels)
            self._pool, self._sizes = put(pool), put(sizes)
            self._any_labeled = bool(sizes.sum() > 0)

        n = self.n
        bpe = n // total  # full batches per epoch (ragged remainder dropped)
        use_epoch = epoch_shuffle and bpe >= 1 and not pair_balanced

        def balanced_idx(labels, step):
            # Mirrors pipeline.BatchIterator._partners / batch(): first
            # half+remainder are uniform anchors; each of the first
            # ``half`` anchors gets a partner sharing >= 1 active label
            # (uniform active class via cumsum inversion, then a uniform
            # member of that class's pool). No-label anchors self-partner.
            half = total // 2
            kb = jax.random.fold_in(jax.random.key(seed ^ 0xBA1A), step)
            k1, k2, k3 = jax.random.split(kb, 3)
            anchors = jax.random.randint(k1, (total - half,), 0, n)
            if half == 0 or not self._any_labeled:
                return anchors if half == 0 else jnp.concatenate(
                    [anchors, anchors[:half]])
            a = labels[anchors[:half]] > 0.5                    # (half, K)
            n_active = a.sum(axis=1)
            u = jax.random.randint(
                k2, (half,), 0, jnp.maximum(n_active, 1))
            c = jnp.argmax(jnp.cumsum(a, axis=1) > u[:, None], axis=1)
            pick = jax.random.randint(
                k3, (half,), 0, jnp.maximum(self._sizes[c], 1))
            partners = jnp.where(
                n_active > 0, self._pool[c, pick], anchors[:half])
            return jnp.concatenate([anchors, partners])

        def fetch(images, labels, step):
            if pair_balanced:
                idx = balanced_idx(labels, step)
            elif use_epoch:
                epoch = step // bpe
                pos = step % bpe
                perm = jax.random.permutation(
                    jax.random.fold_in(jax.random.key(seed ^ 0xE70C), epoch),
                    n,
                )
                idx = jax.lax.dynamic_slice(perm, (pos * total,), (total,))
            else:
                idx = jax.random.randint(
                    jax.random.fold_in(jax.random.key(seed ^ 0xD47A), step),
                    (total,), 0, n,
                )
            imgs = jnp.take(images, idx, axis=0)
            labs = jnp.take(labels, idx, axis=0)
            if n_batches > 1:
                imgs = imgs.reshape((n_batches, batch_size) + imgs.shape[1:])
                labs = labs.reshape(n_batches, batch_size, -1)
            return imgs, labs

        self._fetch = jax.jit(
            fetch,
            out_shardings=None if sharding is None else (sharding, sharding),
        )

    def batch(self, step: int):
        """Device batch for ``step`` — pure in (seed, step)."""
        return self._fetch(self.images, self.labels, np.int32(step))

    def iter(self, start_step: int = 0) -> Iterator[Tuple]:
        step = start_step
        while True:
            out = self.batch(step)
            step += 1
            yield out


class ResidentEncoder:
    """Encode a device-resident split without per-batch wire traffic.

    The host encode path (train/hash_step.py::encode_dataset) transfers
    every image batch over the tunnel at each eval — config4 geometry moves
    ~640 MB per eval, leaking ~1.15x that host-side (docs/BENCHMARKS.md).
    Here the padded uint8 split is parked in HBM once and one jitted
    lax.scan slides a static window over it; per eval the wire carries only
    the params (already resident) and the (n, bits) f32 codes back.

    The split is passed to the jitted runner as an ARGUMENT — capturing it
    as a closure constant would inline ~600 MB into the remote-compile
    request (HTTP 413 at ~268 MB on this platform, CLAUDE.md). The jit
    cache lives on this object: construct once per split and reuse across
    evals, or every call recompiles (50-300 s on axon).
    """

    def __init__(self, encode_fn, dataset: SyntheticImageDataset,
                 batch_size: int = 256):
        self.n = len(dataset)
        bs = min(batch_size, max(32, self.n))
        n_pad = ((self.n + bs - 1) // bs) * bs
        imgs = dataset.images
        if n_pad != self.n:
            imgs = np.concatenate(
                [imgs, np.zeros((n_pad - self.n,) + imgs.shape[1:],
                                imgs.dtype)])
        self.images = jax.device_put(imgs)
        los = jnp.arange(n_pad // bs, dtype=jnp.int32) * bs

        def run(params, images):
            def body(carry, lo):
                b = jax.lax.dynamic_slice_in_dim(images, lo, bs, axis=0)
                return carry, encode_fn(params, b)

            _, codes = jax.lax.scan(body, 0, los)
            return codes.reshape(n_pad, -1)

        self._run = jax.jit(run)

    def __call__(self, params) -> np.ndarray:
        return np.asarray(self._run(params, self.images))[: self.n]


def make_batch_feed(
    dataset: SyntheticImageDataset,
    cfg,
    start_step: int,
    seed: int,
    n_batches: int = 1,
    mesh=None,
    batch_sharding=None,
    pair_balanced: bool = False,
):
    """One switch for the train loops: device-resident feed when
    ``cfg.train.device_data`` (and the mode supports it), else the host
    BatchIterator + prefetch_to_device path."""
    from hashgan_tpu.data.pipeline import BatchIterator, prefetch_to_device

    if cfg.train.device_data and not (pair_balanced and n_batches != 1):
        src = DeviceBatchSource(
            dataset, cfg.train.batch_size, seed=seed,
            epoch_shuffle=cfg.train.epoch_shuffle,
            pair_balanced=pair_balanced, n_batches=n_batches,
            sharding=batch_sharding, mesh=mesh,
        )
        return src.iter(start_step)
    it = BatchIterator(
        dataset, cfg.train.batch_size * n_batches, seed=seed,
        start_step=start_step, epoch_shuffle=cfg.train.epoch_shuffle,
        pair_balanced=pair_balanced,
    )
    if n_batches > 1:
        b = cfg.train.batch_size

        def stacked():
            for imgs, labs in it:
                yield (
                    imgs.reshape((n_batches, b) + imgs.shape[1:]),
                    labs.reshape(n_batches, b, -1),
                )

        stream = stacked()
    else:
        stream = it
    return prefetch_to_device(
        stream, size=max(1, cfg.train.prefetch), sharding=batch_sharding
    )
