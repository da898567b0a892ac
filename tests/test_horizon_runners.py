"""The ref-horizon runner scripts' config plumbing (no jax, no training).

The per-arch stage-II override tables encode measured failure modes
(docs/BENCHMARKS.md round 3): alexnet gets the 227 protocol + 1x hash lr,
from-scratch resnet gets 1x (10x tanh-saturated 10-class cotrain by step
1000), small_cnn keeps its proven defaults. A silent regression here
costs hours of chip time, so the mapping is pinned."""

import importlib
import sys


def _fresh(module: str, monkeypatch, **env):
    for k in ("ENCODER_ARCH", "GAN_CYCLES", "ENC_ITERS", "SMOKE",
              "BITS", "ITERS", "N_CLASSES", "R", "SCARCE_TRAIN"):
        monkeypatch.delenv(k, raising=False)
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    sys.modules.pop(module, None)
    return importlib.import_module(module)


def test_config2_arch_override_table(monkeypatch):
    m = _fresh("scripts.run_config2_ref_horizon", monkeypatch,
               ENCODER_ARCH="alexnet")
    cfg = m.base_config("cotrain")
    assert cfg.encoder.arch == "alexnet"
    assert cfg.encoder.input_resize == 227
    assert cfg.encoder.resize_base == 256
    assert cfg.encoder.hash_lr_multiplier == 1.0

    m = _fresh("scripts.run_config2_ref_horizon", monkeypatch,
               ENCODER_ARCH="resnet")
    cfg = m.base_config("cotrain")
    assert cfg.encoder.arch == "resnet"
    assert cfg.encoder.hash_lr_multiplier == 1.0
    assert cfg.encoder.input_resize == 0  # native size

    m = _fresh("scripts.run_config2_ref_horizon", monkeypatch)
    cfg = m.base_config("cotrain")
    assert cfg.encoder.arch == "small_cnn"  # measured-safe default
    assert cfg.train.device_data
    assert cfg.eval.R == 5000

    real = m.base_config("realonly")
    assert not real.use_gan
    assert real.train.workdir != cfg.train.workdir


def test_config3_arch_override_table(monkeypatch):
    m = _fresh("scripts.run_config3_ref_horizon", monkeypatch)
    cfg = m.base_config("cotrain")
    assert cfg.encoder.arch == "resnet"  # 64px-native default
    assert cfg.encoder.hash_lr_multiplier == 1.0
    assert cfg.data.multi_label
    assert cfg.train.pair_sampling == "balanced"
    assert cfg.train.device_data
    assert cfg.gan.ema_decay == 0.999

    m = _fresh("scripts.run_config3_ref_horizon", monkeypatch, SMOKE="1")
    cfg = m.base_config("cotrain")
    # 32 is the GAN pyramid's minimum base (models/gan.py) — 16 crashed.
    assert cfg.data.image_size == 32


def test_bit_sweep_defaults(monkeypatch):
    m = _fresh("scripts.run_bit_sweep", monkeypatch)
    assert m.BITS == (16, 24, 32, 48)
    cfg = m.build_config(24)
    assert cfg.encoder.bits == 24 and cfg.index.bits == 24
    # 10-class synthetic saturates every width (measured 16-bit MAP 1.0);
    # the default geometry must stay at 100 classes / R=1000.
    assert cfg.data.n_classes == 100
    assert cfg.eval.R == 1000
    assert not cfg.use_gan
