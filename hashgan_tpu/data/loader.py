"""Disk-backed list-file dataset loading (real CIFAR/NUS-WIDE when present).

Reference parity (SURVEY.md C15): the reference's ``Dataset`` class reads
``data_list`` entries, decodes images with PIL/cv2, and caches them. Here we
decode once into a contiguous uint8 array (datasets at HashGAN scale fit in
host RAM) so the hot path is pure array slicing.
"""

from __future__ import annotations

import numpy as np

from hashgan_tpu.configs import DataConfig
from hashgan_tpu.data.lists import parse_list_file
from hashgan_tpu.data.synthetic import SyntheticImageDataset


def load_list_dataset(list_path: str, cfg: DataConfig) -> SyntheticImageDataset:
    from PIL import Image

    paths, labels = parse_list_file(list_path)
    size = cfg.image_size
    images = np.zeros((len(paths), size, size, cfg.channels), dtype=np.uint8)
    for i, p in enumerate(paths):
        with Image.open(p) as im:
            im = im.convert("RGB" if cfg.channels == 3 else "L")
            im = im.resize((size, size), Image.BILINEAR)
            arr = np.asarray(im, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        images[i] = arr
    return SyntheticImageDataset(images=images, labels=labels.astype(np.float32))
