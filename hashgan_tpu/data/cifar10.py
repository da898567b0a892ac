"""Standard CIFAR-10 archive importer (python-pickle and binary formats).

Reference parity last mile (SURVEY.md C15): the reference consumes CIFAR-10
through pre-rendered ``data_list`` files of per-image paths; this module
instead ingests the two standard distribution formats directly —

- ``cifar-10-batches-py``: ``data_batch_1..5`` + ``test_batch`` pickles,
  each ``{b"data": (10000, 3072) uint8, b"labels": [int]*10000}``;
- ``cifar-10-batches-bin``: ``data_batch_1..5.bin`` + ``test_batch.bin``,
  rows of 1 label byte + 3072 image bytes (R, G, B planes);

and cuts the BASELINE config-1/2 protocol splits (per class: 100 query /
500 train, remainder database -> 1000 / 5000 / 54000) deterministically
from ``cfg.seed``. Zero-code drop-in: point ``DataConfig.cifar10_dir`` at
an extracted archive and config1/config2 run on real data.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Tuple

import numpy as np

from hashgan_tpu.configs import DataConfig
from hashgan_tpu.data.synthetic import SyntheticImageDataset

_PY_BATCHES = [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]
_BIN_BATCHES = [f"data_batch_{i}.bin" for i in range(1, 6)] + ["test_batch.bin"]
_ROW_BYTES = 1 + 3072  # binary format: label byte + 32*32*3 image bytes


def _decode_images(flat: np.ndarray) -> np.ndarray:
    """(N, 3072) planar R,G,B rows -> (N, 32, 32, 3) uint8 NHWC."""
    return flat.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)


def load_cifar10_dir(root: str) -> Tuple[np.ndarray, np.ndarray]:
    """Load all 60k images + integer labels from an extracted CIFAR-10
    archive directory (either format, auto-detected; ``root`` may be the
    archive dir itself or its parent containing ``cifar-10-batches-*``)."""
    for sub in ("", "cifar-10-batches-py", "cifar-10-batches-bin"):
        d = os.path.join(root, sub) if sub else root
        if os.path.exists(os.path.join(d, _PY_BATCHES[0])):
            return _load_py(d)
        if os.path.exists(os.path.join(d, _BIN_BATCHES[0])):
            return _load_bin(d)
    raise FileNotFoundError(
        f"no CIFAR-10 batches (python or binary format) under {root!r}"
    )


def _load_py(d: str) -> Tuple[np.ndarray, np.ndarray]:
    imgs, labs = [], []
    for name in _PY_BATCHES:
        with open(os.path.join(d, name), "rb") as f:
            batch = pickle.load(f, encoding="bytes")
        data = np.asarray(batch[b"data"], dtype=np.uint8)
        if data.shape[1] != 3072:
            raise ValueError(f"{name}: expected 3072 bytes/row, got {data.shape}")
        imgs.append(_decode_images(data))
        labs.append(np.asarray(batch[b"labels"], dtype=np.int64))
    return np.concatenate(imgs), np.concatenate(labs)


def _load_bin(d: str) -> Tuple[np.ndarray, np.ndarray]:
    imgs, labs = [], []
    for name in _BIN_BATCHES:
        raw = np.fromfile(os.path.join(d, name), dtype=np.uint8)
        if raw.size % _ROW_BYTES:
            raise ValueError(f"{name}: size {raw.size} not a multiple of "
                             f"{_ROW_BYTES}")
        rows = raw.reshape(-1, _ROW_BYTES)
        labs.append(rows[:, 0].astype(np.int64))
        imgs.append(_decode_images(rows[:, 1:]))
    return np.concatenate(imgs), np.concatenate(labs)


def make_cifar10_splits(
    root: str, cfg: DataConfig
) -> Dict[str, SyntheticImageDataset]:
    """BASELINE protocol splits from a real CIFAR-10 archive.

    Per class: n_query/10 query + n_train/10 train, sampled without
    replacement from a cfg.seed-deterministic shuffle; the remainder is the
    database (disjoint from both — 1000/5000/54000 at the defaults).
    n_database caps the remainder if set smaller."""
    images, int_labels = load_cifar10_dir(root)
    n_classes = 10
    per_q = cfg.n_query // n_classes
    per_t = cfg.n_train // n_classes
    rng = np.random.default_rng(cfg.seed)
    q_idx, t_idx, db_idx = [], [], []
    for c in range(n_classes):
        pool = np.flatnonzero(int_labels == c)
        if pool.size < per_q + per_t:
            raise ValueError(
                f"class {c}: {pool.size} examples < query+train "
                f"{per_q + per_t}"
            )
        pool = pool[rng.permutation(pool.size)]
        q_idx.append(pool[:per_q])
        t_idx.append(pool[per_q : per_q + per_t])
        db_idx.append(pool[per_q + per_t :])
    out: Dict[str, SyntheticImageDataset] = {}
    onehot = np.eye(n_classes, dtype=np.float32)
    for split, parts, cap in (
        ("train", t_idx, cfg.n_train),
        ("query", q_idx, cfg.n_query),
        ("database", db_idx, cfg.n_database),
    ):
        idx = np.sort(np.concatenate(parts))
        if cap and idx.size > cap:
            idx = idx[rng.permutation(idx.size)[:cap]]
            idx = np.sort(idx)
        out[split] = SyntheticImageDataset(
            images=images[idx], labels=onehot[int_labels[idx]]
        )
    return out
