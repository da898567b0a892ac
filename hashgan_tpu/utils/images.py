"""Image-grid dumps for qualitative GAN monitoring.

Reference parity (SURVEY.md C18): tiles a batch of generated samples into
one PNG per dump (``samples_<iter>.png``).
"""

from __future__ import annotations

import math

import numpy as np


def save_image_grid(images: np.ndarray, path: str, n_cols: int = 0) -> None:
    """images: (N, H, W, C) uint8 or float in [-1, 1] / [0, 1]."""
    images = np.asarray(images)
    if images.dtype != np.uint8:
        lo, hi = float(images.min()), float(images.max())
        if lo < 0:  # assume [-1, 1]
            images = (images + 1.0) * 127.5
        elif hi <= 1.0:
            images = images * 255.0
        images = np.clip(images, 0, 255).astype(np.uint8)
    n, h, w, c = images.shape
    cols = n_cols or int(math.ceil(math.sqrt(n)))
    rows = int(math.ceil(n / cols))
    grid = np.zeros((rows * h, cols * w, c), dtype=np.uint8)
    for i in range(n):
        r, col = divmod(i, cols)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = images[i]
    from PIL import Image

    if c == 1:
        Image.fromarray(grid[:, :, 0], mode="L").save(path)
    else:
        Image.fromarray(grid).save(path)
