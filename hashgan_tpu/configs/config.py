"""Typed configuration system.

Reference parity (SURVEY.md C20): the reference threads a yaml->easydict attr
config (``config/*.yaml``) through ``main.py``. Here every run is a frozen,
typed dataclass tree; presets cover the five BASELINE.json benchmark configs,
and ``load_yaml`` accepts reference-style yaml overrides on top of a preset.
No hidden globals (the reference's global param store C1 is replaced by Flax
module trees).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple


@dataclass(frozen=True)
class DataConfig:
    """Dataset description. Mirrors the reference's data_list/<ds>/*.txt setup
    (SURVEY.md C15) with a synthetic fallback (no network in dev env)."""

    name: str = "cifar10"
    image_size: int = 32                  # square images
    channels: int = 3
    n_classes: int = 10
    multi_label: bool = False             # NUS-WIDE: label vectors, not one-hot
    # Reference-style list files: "<path> <0/1 label bits...>" per line.
    train_list: Optional[str] = None
    test_list: Optional[str] = None       # query split
    database_list: Optional[str] = None   # gallery split
    # Extracted standard CIFAR-10 archive (python or binary batches):
    # zero-code real-data drop-in for configs 1/2 (data/cifar10.py).
    cifar10_dir: Optional[str] = None
    # Synthetic fallback sizes (used when list files are absent).
    synthetic: bool = True
    n_train: int = 5000
    n_query: int = 1000
    n_database: int = 54000
    noise_scale: float = 40.0             # synthetic class-signal difficulty
    seed: int = 0


@dataclass(frozen=True)
class GanConfig:
    """PC-WGAN architecture + loss (SURVEY.md C8, C10, C11, C13)."""

    dim: int = 128                        # base channel width ("DIM")
    z_dim: int = 128
    n_critic: int = 5                     # critic steps per generator step
    gp_lambda: float = 10.0               # gradient-penalty weight
    acgan_scale: float = 1.0              # aux classification loss on D
    acgan_scale_g: float = 0.1            # aux classification loss on G
    lr: float = 2e-4
    beta1: float = 0.0
    beta2: float = 0.9
    iters: int = 100_000                  # generator iterations
    decay_lr: bool = True                 # linear lr decay over iters
    ema_decay: float = 0.0                # generator weight EMA (0 = off)
    # bf16 matmuls on MXU; params + loss stay f32.
    compute_dtype: str = "bfloat16"
    # --- stage-I convergence knobs (round 4; the 64px multi-label
    # direction plateaued at |W| 24-87 across three rounds of budgets —
    # docs/BENCHMARKS.md "scarce multi-label" rows) ---
    d_layernorm: bool = False             # LayerNorm in critic res-blocks
                                          # (SURVEY.md C7: the reference's
                                          # critic normalization under GP)
    acgan_fake_scale: float = 0.0         # aux CE on FAKE images in the
                                          # critic loss (full-ACGAN D); 0
                                          # keeps the reference's real-only
                                          # aux training
    # Per-block channel-width multipliers (x dim). None = constant width
    # (the 32px reference net). G: len n_up+1 (input 4x4 stage + each
    # up-block); D: len n_blocks (block_in, extra..., block_down, a, b).
    g_width_mults: Optional[Tuple[int, ...]] = None
    d_width_mults: Optional[Tuple[int, ...]] = None
    # Normalize multi-hot condition vectors to unit sum before the label
    # embedding and CondBN tables (one-hot unaffected): keeps conditioning
    # magnitude independent of the number of active concepts.
    cond_label_norm: bool = False
    # Projection critic conditioning (Miyato & Koyama): adds <V y, phi(x)>
    # to the critic score so the conditioning gradient reaches G through
    # the adversarial term itself rather than only the acgan_scale_g-scaled
    # aux CE (measured chance-pinned at 100 classes — docs/BENCHMARKS.md
    # phase-4 conditioning sweep). False keeps the pre-round-4 param tree.
    d_projection: bool = False


@dataclass(frozen=True)
class EncoderConfig:
    """Hash encoder F (SURVEY.md C9)."""

    arch: str = "small_cnn"               # small_cnn | alexnet | resnet
    bits: int = 32
    lr: float = 1e-3
    hash_lr_multiplier: float = 10.0      # reference: 10x lr on new hash layer
    iters: int = 10_000
    decay_lr: bool = False                # linear lr decay over iters
                                          # (reference-horizon runs: decay to
                                          # 0 across the full stage-II budget)
    pretrained_npy: Optional[str] = None  # bvlc_alexnet.npy path if available
    # Reference AlexNet input protocol (SURVEY.md C9/§3.5): resize to
    # ``resize_base`` (256), random-crop (train) / center-crop (eval) to
    # ``input_resize`` (227), mean-subtract, flip. 0 disables (images run at
    # native size); resize_base=0 means "same as input_resize" (pure resize).
    input_resize: int = 0
    resize_base: int = 0
    compute_dtype: str = "bfloat16"


@dataclass(frozen=True)
class HashLossConfig:
    """WML pairwise loss + quantization (SURVEY.md C12)."""

    similarity: str = "cosine"            # cosine | inner_product
    alpha: float = 5.0                    # logistic scale on similarity (10 collapses at high lr)
    class_balance: bool = True            # w_ij = |S|/|S1| vs |S|/|S0|
    class_balance_cap: float = 25.0       # clip balance weights (many-class
                                          # tasks: w_pos ~ n_classes blasts the
                                          # 10x-lr hash layer into saturation)
    # How class_balance counts pairs under a fake_pair_weight discount:
    # "count" = raw mask counts (bit-exact with pre-round-5 runs; on scarce
    # one-hot tasks a sub-unit discount then silently under-pulls positives
    # — measured collapse, see losses/pairwise.py); "mass" = discount-
    # weighted masses (discount orthogonal to rebalancing).
    class_balance_mode: str = "count"
    quantization_weight: float = 0.01     # push codes toward +-1
    balance_weight: float = 2.0           # per-bit batch-mean^2 (anti-collapse)


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 64
    eval_every: int = 2000
    checkpoint_every: int = 2000
    log_every: int = 100
    sample_every: int = 1000              # image-grid dumps
    workdir: str = "/tmp/hashgan_tpu"
    seed: int = 0
    use_gan_samples: bool = True          # stage-II: train F on real + fake
    fake_ratio: float = 0.5               # fraction of encoder batch synthetic
    # Pair-loss discount for synthetic samples: pairs touching a fake are
    # scaled by this (real-fake f, fake-fake f^2) inside the WML weighted
    # mean. 1.0 = the reference's uniform weighting (and a bit-identical
    # jaxpr: the weight tensor is only built when != 1). Useful when G's
    # conditioning is imperfect — inherited labels then carry noise and a
    # sub-unit weight prices that in (measured round 4: conditioning at
    # chance costs -7.1 MAP on config3_cal scarce).
    fake_pair_weight: float = 1.0
    crop_pad: int = 0                     # pad-and-random-crop aug (0 = off)
    prefetch: int = 2                     # batches in flight host->device
    epoch_shuffle: bool = False           # without-replacement epoch sampling
    # Device-resident data: park the train split in HBM and gather batches
    # in-jit (data/device_data.py) — no per-step wire traffic or host
    # gather. Step-pure and resume-exact WITHIN this mode; the host and
    # device pipelines define different (each deterministic) data orders,
    # so a run must keep the pipeline it started with.
    device_data: bool = False
    # Stage-II batch policy: "random" | "balanced" (label-conditioned pair
    # sampling — BASELINE config 3's guarantee of positive pairs per batch).
    pair_sampling: str = "random"


@dataclass(frozen=True)
class IndexConfig:
    """Packed Hamming index + scan engine (the rebuild's new native layer)."""

    bits: int = 32
    query_tile: int = 128                 # queries per kernel tile
    gallery_block: int = 32768            # gallery codes per scan block
    topk: int = 100                       # serving top-k


@dataclass(frozen=True)
class EvalConfig:
    """Hamming-ranking eval (SURVEY.md C16)."""

    R: int = 1000                         # MAP@R cutoff (5000 for NUS-WIDE)
    precision_radius: int = 2             # precision@Hamming<=2
    pr_curve: bool = True
    # Galleries past this size stream histogram MAP instead of exact
    # ranked MAP (both tie-aware; see eval/streaming.py).
    streaming_threshold: int = 200_000
    # Minimum split size before the encode forward shards over the mesh
    # (below it, single-device keeps f32 summation order deterministic).
    encode_shard_min: int = 50_000


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh for pjit/shard_map (SURVEY.md C23/C24)."""

    data_axis: str = "data"
    n_devices: int = 0                    # 0 = all available


@dataclass(frozen=True)
class Config:
    name: str = "cifar10_32bit_encoder_only"
    data: DataConfig = field(default_factory=DataConfig)
    gan: GanConfig = field(default_factory=GanConfig)
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    hash_loss: HashLossConfig = field(default_factory=HashLossConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    index: IndexConfig = field(default_factory=IndexConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    use_gan: bool = True                  # False = encoder-only (config 1)


# ----------------------------------------------------------------------------
# Presets: the five BASELINE.json benchmark configs.
# ----------------------------------------------------------------------------

def _cifar10_encoder_only() -> Config:
    return Config(
        name="cifar10_32bit_encoder_only",
        data=DataConfig(name="cifar10", n_classes=10),
        encoder=EncoderConfig(arch="small_cnn", bits=32),
        index=IndexConfig(bits=32),
        eval=EvalConfig(R=1000),
        use_gan=False,
    )


def _cifar10_gan() -> Config:
    return Config(
        name="cifar10_48bit_gan",
        data=DataConfig(name="cifar10", n_classes=10),
        gan=GanConfig(dim=128),
        encoder=EncoderConfig(arch="alexnet", bits=48),
        index=IndexConfig(bits=48),
        eval=EvalConfig(R=5000),
        use_gan=True,
    )


def _nuswide_gan() -> Config:
    return Config(
        name="nuswide_64bit_gan",
        data=DataConfig(
            name="nuswide", n_classes=21, multi_label=True,
            image_size=64, n_database=100_000, n_query=2100, n_train=10_500,
        ),
        gan=GanConfig(dim=128),
        encoder=EncoderConfig(arch="alexnet", bits=64),
        # BASELINE config 3: label-conditioned pair sampling (multi-label
        # batches must contain positive pairs for the WML loss).
        train=TrainConfig(pair_sampling="balanced"),
        index=IndexConfig(bits=64),
        eval=EvalConfig(R=5000),
        use_gan=True,
    )


def _imagenet100() -> Config:
    return Config(
        name="imagenet100_64bit",
        data=DataConfig(
            name="imagenet100", n_classes=100, image_size=64,
            n_database=100_000, n_query=5000, n_train=13_000,
        ),
        gan=GanConfig(dim=128),
        encoder=EncoderConfig(arch="resnet", bits=64),
        index=IndexConfig(bits=64),
        eval=EvalConfig(R=1000),
        use_gan=True,
    )


def _synthetic_1m_scan() -> Config:
    return Config(
        name="synthetic_1m_128bit_scan",
        data=DataConfig(
            name="synthetic", n_classes=100,
            n_database=1_000_000, n_query=1024, n_train=0,
        ),
        encoder=EncoderConfig(bits=128),
        index=IndexConfig(bits=128, gallery_block=65536, topk=100),
        eval=EvalConfig(R=1000),
        use_gan=False,
    )


def _cifar10_encoder_only_cal() -> Config:
    """config1 on a CALIBRATED synthetic task (VERDICT r3 #3): the 10-class
    task saturates MAP at any code length (measured 1.0 even at 16 bits —
    CLAUDE.md training facts), so the preset metric could not move in either
    direction. 100 classes at the same geometry lands mid-range like the
    paper's 0.73-0.84 CIFAR band (bit-sweep measurements:
    docs/artifacts/bit_sweep_50k.json), where deltas are visible."""
    cfg = _cifar10_encoder_only()
    return dataclasses.replace(
        cfg, name="cifar10_32bit_encoder_only_cal",
        data=dataclasses.replace(cfg.data, n_classes=100),
    )


def _cifar10_gan_cal() -> Config:
    """config2 on the CALIBRATED single-label task (VERDICT r4 #7): 100
    classes at the CIFAR geometry, where MAP lands mid-range (bit-sweep
    measurements, docs/artifacts/bit_sweep_50k.json) instead of the
    10-class task's 1.0 saturation. Eval R=1000 matches the calibrated
    protocol the bit sweeps established (at 100 classes each class has
    ~540 database items, so R=5000 is mostly forced negatives).
    Conditioning at <=21 one-hot classes is known-good; this is the
    easier-direction scarce-delta testbed (32px one-hot vs config3_cal's
    64px multi-hot)."""
    cfg = _cifar10_gan()
    return dataclasses.replace(
        cfg, name="cifar10_48bit_gan_cal",
        data=dataclasses.replace(cfg.data, n_classes=100),
        eval=dataclasses.replace(cfg.eval, R=1000),
    )


def _nuswide_gan_cal() -> Config:
    """config3 on a CALIBRATED multi-label task: 21 concepts saturate both
    arms at the full split (cotrain 0.9999 / realonly 1.0000 —
    docs/artifacts/config3_horizon_summary.json); 100 concepts at the same
    geometry keeps the protocol metric mid-range."""
    cfg = _nuswide_gan()
    return dataclasses.replace(
        cfg, name="nuswide_64bit_gan_cal",
        data=dataclasses.replace(cfg.data, n_classes=100),
    )


_PRESETS = {
    "cifar10_32bit_encoder_only": _cifar10_encoder_only,
    "cifar10_48bit_gan": _cifar10_gan,
    "nuswide_64bit_gan": _nuswide_gan,
    "imagenet100_64bit": _imagenet100,
    "synthetic_1m_128bit_scan": _synthetic_1m_scan,
    "cifar10_32bit_encoder_only_cal": _cifar10_encoder_only_cal,
    "cifar10_48bit_gan_cal": _cifar10_gan_cal,
    "nuswide_64bit_gan_cal": _nuswide_gan_cal,
}

# Aliases matching BASELINE.json config numbering.
_PRESETS["config1"] = _cifar10_encoder_only
_PRESETS["config2"] = _cifar10_gan
_PRESETS["config3"] = _nuswide_gan
_PRESETS["config4"] = _imagenet100
_PRESETS["config5"] = _synthetic_1m_scan
_PRESETS["config1_cal"] = _cifar10_encoder_only_cal
_PRESETS["config2_cal"] = _cifar10_gan_cal
_PRESETS["config3_cal"] = _nuswide_gan_cal


def list_presets() -> Tuple[str, ...]:
    return tuple(sorted(_PRESETS))


def get_config(name: str) -> Config:
    if name not in _PRESETS:
        raise KeyError(f"unknown preset {name!r}; options: {list_presets()}")
    return _PRESETS[name]()


def _merge(cfg: Any, overrides: dict) -> Any:
    """Recursively apply a dict of overrides to a (frozen) dataclass tree."""
    updates = {}
    for key, value in overrides.items():
        if not hasattr(cfg, key):
            raise KeyError(f"unknown config field {key!r} on {type(cfg).__name__}")
        current = getattr(cfg, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            updates[key] = _merge(current, value)
        else:
            updates[key] = value
    return dataclasses.replace(cfg, **updates)


def load_yaml(path: str, base: Optional[str] = None) -> Config:
    """Load a yaml override file on top of a preset.

    The yaml may set ``preset: <name>`` (else ``base`` or config 1 is used)
    and any nested subset of Config fields, e.g.::

        preset: cifar10_48bit_gan
        encoder: {bits: 64}
        train: {batch_size: 128}
    """
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    preset = raw.pop("preset", base or "cifar10_32bit_encoder_only")
    return _merge(get_config(preset), raw)
