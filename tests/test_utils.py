import json
import os

import numpy as np

from hashgan_tpu.utils import MetricsLogger, save_image_grid
from hashgan_tpu.utils.profiling import kernel_throughput, time_fn


def test_metrics_logger_jsonl_and_history(tmp_path):
    logger = MetricsLogger(str(tmp_path), plot=False, quiet=True)
    for step in range(1, 6):
        logger.log(step, {"loss": float(step), "aux": 2.0})
    means = logger.flush(5)
    assert means["loss"] == 3.0  # mean of 1..5
    with open(os.path.join(str(tmp_path), "metrics.jsonl")) as f:
        rec = json.loads(f.readline())
    assert rec["step"] == 5 and rec["loss"] == 3.0
    # second flush appends
    logger.log(6, {"loss": 10.0})
    logger.flush(6)
    lines = open(os.path.join(str(tmp_path), "metrics.jsonl")).readlines()
    assert len(lines) == 2


def test_metrics_logger_renders_curves(tmp_path):
    logger = MetricsLogger(str(tmp_path), plot=True, quiet=True)
    for step in (1, 2, 3):
        logger.log(step, {"x": float(step)})
        logger.flush(step)
    assert os.path.exists(os.path.join(str(tmp_path), "x.jpg"))


def test_save_image_grid_uint8_and_float(tmp_path):
    rng = np.random.default_rng(0)
    imgs_u8 = rng.integers(0, 255, (5, 8, 8, 3), dtype=np.uint8)
    p1 = str(tmp_path / "grid_u8.png")
    save_image_grid(imgs_u8, p1)
    assert os.path.getsize(p1) > 0
    imgs_f = rng.uniform(-1, 1, (4, 8, 8, 1)).astype(np.float32)
    p2 = str(tmp_path / "grid_f.png")
    save_image_grid(imgs_f, p2)
    from PIL import Image

    assert Image.open(p1).size == (8 * 3, 8 * 2)  # 5 imgs -> 3x2 grid
    assert Image.open(p2).size == (8 * 2, 8 * 2)


def test_time_fn_and_throughput():
    import jax.numpy as jnp

    def f(x):
        return (jnp.asarray(x) * 2.0,)

    dt = time_fn(f, np.ones(16), iters=2)
    assert dt >= 0
    stats = kernel_throughput(f, np.ones(16), bytes_accessed=128, ops=16, iters=2)
    assert stats["gbytes_per_sec"] > 0 and stats["gops_per_sec"] > 0
