"""hashgan_tpu — a TPU-native rebuild of the HashGAN capability set.

HashGAN (CVPR 2018, thuml/HashGAN) is a deep supervised hashing system:
it learns an encoder F: image -> b-bit binary code whose Hamming distances
reflect label similarity, and augments scarce pairwise supervision with a
Pair-Conditional Wasserstein GAN (PC-WGAN) so the encoder co-trains on
real + synthetic images.

This package is a clean-room, TPU-first re-design (see SURVEY.md):

- ``models/``   Flax modules: ResNet G/D with conditional BatchNorm,
                hash encoders (small CNN, AlexNet-style, ResNet backbone).
- ``losses/``   WGAN-GP (grad-of-grad via ``jax.grad`` inside the loss),
                pair-conditional aux loss, WML pairwise hash loss + quantization.
- ``train/``    Device-resident jitted train steps (the full n_critic+1 GAN
                cycle is ONE jitted step — no per-step host feed boundary).
- ``ops/``      Pallas TPU kernels: fused sign->bitpack to uint32 lanes and a
                blockwise XOR-popcount Hamming scan, plus numpy oracles.
- ``index/eval``Streaming on-device Hamming ranking: MAP@R, P@H<=2, PR curves.
- ``parallel/`` Mesh + sharding: data-parallel gradients via ``shard_map``
                + ``psum``; gallery sharding with all-gather top-k merge.
- ``data/``     Reference-compatible list-file datasets + synthetic generators.

Reference parity map lives in SURVEY.md section 2 (components C1-C24).
"""

__version__ = "0.2.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import hashgan_tpu` jax-free)."""
    if name == "Experiment":
        from hashgan_tpu.train.loop import Experiment

        return Experiment
    if name == "QueryEngine":
        from hashgan_tpu.index.engine import QueryEngine

        return QueryEngine
    if name in ("Config", "get_config", "load_yaml", "list_presets"):
        import hashgan_tpu.configs as _c

        return getattr(_c, name)
    raise AttributeError(name)
