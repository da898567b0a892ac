"""Host-side batching with deterministic, resumable sampling.

Reference parity (SURVEY.md C15, §3.5): the reference's ``Dataset.data()``
generator shuffles per epoch and feeds each batch through ``feed_dict`` —
a host->device copy per session step. Here batches are step-seeded (batch
content is a pure function of (seed, step), so checkpoint resume replays the
exact data order — SURVEY.md §5 failure-recovery contract), transferred as
uint8 (4x smaller than f32 on the wire), and normalization happens inside
the jitted step on device.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np

from hashgan_tpu.data.synthetic import SyntheticImageDataset


class BatchIterator:
    """Yields (images uint8 (B,H,W,C), labels f32 (B,K)) batches.

    Sampling modes, all step-pure (``batch(step)`` is a function of
    (seed, step) only, so checkpoint resume replays the exact data order):

    - with replacement (default): per-step uniform draw.
    - ``epoch_shuffle``: the reference's protocol (SURVEY.md §3.5
      "shuffle epoch") — a per-epoch permutation without replacement,
      epoch = step // batches_per_epoch, seeded by (seed, epoch).
    - ``pair_balanced``: label-conditioned pair sampling (BASELINE config 3):
      the first half of the batch is drawn uniformly, the second half pairs
      each first-half item with another example sharing >= 1 active label —
      guaranteeing the WML loss a floor of B/2 positive pairs per batch even
      on sparse multi-label data (random batches can starve it).

    ``start_step`` lets a resumed run continue the sequence.
    """

    def __init__(
        self,
        dataset: SyntheticImageDataset,
        batch_size: int,
        seed: int = 0,
        start_step: int = 0,
        epoch_shuffle: bool = False,
        pair_balanced: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.step = start_step
        self.epoch_shuffle = epoch_shuffle
        self.pair_balanced = pair_balanced
        self._perm_cache: Tuple[int, np.ndarray] | None = None
        self._class_index: tuple | None = None  # (concat, offsets, sizes)

    def _partners(self, rng: np.random.Generator, idx: np.ndarray) -> np.ndarray:
        """For each item, a (step-pure) partner sharing >= 1 active label;
        items with no active labels partner with themselves.

        Vectorized (O(B) numpy ops, two batched rng draws): this sits on the
        training critical path in pair_balanced mode — prefetch_to_device is
        a generator, not a thread, so per-item host loops here would stall
        the device between steps."""
        labels = self.dataset.labels
        if self._class_index is None:
            # Ragged class pools, flattened: pool for class c is
            # concat[offsets[c]:offsets[c+1]] (row-major over classes).
            act = labels > 0.5
            rows, cols = np.nonzero(act.T)  # rows=class ids, cols=item ids
            sizes = act.sum(axis=0).astype(np.int64)
            offsets = np.concatenate([[0], np.cumsum(sizes)])
            self._class_index = (cols, offsets, sizes)
        concat, offsets, sizes = self._class_index
        if concat.size == 0:
            # No item has any active label: every row self-partners (the
            # dummy-class gather below would index an empty pool).
            return idx
        a = labels[idx] > 0.5                     # (B, K)
        n_active = a.sum(axis=1)
        # u-th active class per row via cumsum inversion (rows with no
        # active label get a dummy class and are overridden below).
        u = rng.integers(0, np.maximum(n_active, 1))
        c = np.argmax(np.cumsum(a, axis=1) > u[:, None], axis=1)
        pick = rng.integers(0, np.maximum(sizes[c], 1))
        partners = concat[offsets[c] + pick]
        return np.where(n_active > 0, partners, idx)

    def _epoch_perm(self, epoch: int) -> np.ndarray:
        if self._perm_cache is not None and self._perm_cache[0] == epoch:
            return self._perm_cache[1]
        rng = np.random.default_rng((self.seed, epoch, 0xE70C))
        perm = rng.permutation(len(self.dataset))
        self._perm_cache = (epoch, perm)
        return perm

    def batch(self, step: int) -> Tuple[np.ndarray, np.ndarray]:
        n = len(self.dataset)
        if self.pair_balanced:
            rng = np.random.default_rng((self.seed, step, 0xBA1A))
            half = self.batch_size // 2
            anchors = rng.integers(0, n, size=self.batch_size - half)
            partners = self._partners(rng, anchors[:half])
            idx = np.concatenate([anchors, partners])
            return self.dataset.images[idx], self.dataset.labels[idx]
        if self.epoch_shuffle:
            bpe = max(1, n // self.batch_size)  # drop the ragged remainder
            epoch, pos = divmod(step, bpe)
            idx = self._epoch_perm(epoch)[
                pos * self.batch_size : (pos + 1) * self.batch_size
            ]
            if idx.shape[0] < self.batch_size:  # dataset smaller than batch
                rng = np.random.default_rng((self.seed, step, 0xF111))
                extra = rng.integers(0, n, size=self.batch_size - idx.shape[0])
                idx = np.concatenate([idx, extra])
        else:
            rng = np.random.default_rng((self.seed, step))
            idx = rng.integers(0, n, size=self.batch_size)
        return self.dataset.images[idx], self.dataset.labels[idx]

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        return self

    def __next__(self) -> Tuple[np.ndarray, np.ndarray]:
        out = self.batch(self.step)
        self.step += 1
        return out


def pair_batch_iterator(
    dataset: SyntheticImageDataset,
    batch_size: int,
    seed: int = 0,
    start_step: int = 0,
    policy: str = "random",
) -> BatchIterator:
    """Iterator for pairwise-supervised training.

    The WML loss consumes all B^2 pairs inside a batch (SURVEY.md C12).
    policy="random": plain shuffled batches (S_ij computed on-device from
    labels). policy="balanced": label-conditioned pair sampling (BASELINE
    config 3) — half the batch is paired with same-label partners so sparse
    multi-label data always yields positive pairs.
    """
    return BatchIterator(
        dataset, batch_size, seed=seed, start_step=start_step,
        pair_balanced=(policy == "balanced"),
    )


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Double-buffered host->device prefetch.

    Keeps ``size`` batches in flight so the (high-latency) transfer of
    batch t+1 overlaps the device compute of batch t — the uint8 wire
    format (4x smaller than f32) plus this prefetch is the rebuild's answer
    to the reference's per-step feed_dict stall. ``sharding`` optionally
    places each leaf (e.g. batch-sharded over a mesh).
    """
    import collections

    import jax

    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            queue.append(jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), batch
            ))
        else:
            queue.append(jax.tree_util.tree_map(jax.device_put, batch))

    for batch in iterator:
        put(batch)
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def epoch_batches(
    dataset: SyntheticImageDataset, batch_size: int
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Deterministic full sweep in order, for encoding query/database splits.

    Yields (images, labels, valid_mask); the final batch is zero-padded to
    batch_size so jitted encode functions see a single static shape.
    """
    n = len(dataset)
    for lo in range(0, n, batch_size):
        hi = min(lo + batch_size, n)
        imgs = dataset.images[lo:hi]
        labs = dataset.labels[lo:hi]
        mask = np.ones(hi - lo, dtype=bool)
        if hi - lo < batch_size:
            pad = batch_size - (hi - lo)
            imgs = np.concatenate([imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)])
            labs = np.concatenate([labs, np.zeros((pad,) + labs.shape[1:], labs.dtype)])
            mask = np.concatenate([mask, np.zeros(pad, dtype=bool)])
        yield imgs, labs, mask
