"""Round-4 VERDICT items: mesh ServingPipeline (r3 "what's weak" #6 /
next-round #8) — the double-buffered fused serving loop extended to mesh
galleries via the sharded MXU engines, correctness-tested on the forced-CPU
device grid at mesh {2, 8}."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _mk_engine(mesh, n=500, bits=32, seed=4):
    from hashgan_tpu.index import QueryEngine, build_gallery
    from hashgan_tpu.models.encoders import build_encoder

    rng = np.random.default_rng(seed)
    codes = np.where(
        rng.uniform(size=(n, bits)) < 0.5, -1.0, 1.0
    ).astype(np.float32)
    labels = np.eye(2, dtype=np.float32)[np.zeros(n, int)]
    gal = build_gallery(jnp.asarray(codes), labels, bits, mesh=mesh,
                        use_pallas=False)
    enc = build_encoder("small_cnn", bits)
    dummy = jnp.zeros((2, 16, 16, 3), jnp.float32)
    params = enc.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        dummy, train=False,
    )["params"]
    return QueryEngine(enc, params, gal)


@pytest.mark.parametrize("nd", [2, 8])
@pytest.mark.parametrize("k", [10, 300])
def test_mesh_serving_pipeline_matches_single_chip(nd, k):
    from hashgan_tpu.index import ServingPipeline
    from hashgan_tpu.parallel import make_mesh

    rng = np.random.default_rng(7)
    batches = [
        rng.integers(0, 255, (8, 16, 16, 3)).astype(np.uint8)
        for _ in range(4)
    ]
    single = ServingPipeline(_mk_engine(None), k=k, depth=2, interpret=True)
    ref = list(single.map_batches(batches))
    mesh_pipe = ServingPipeline(
        _mk_engine(make_mesh(nd)), k=k, depth=2, interpret=True
    )
    got = list(mesh_pipe.map_batches(batches))
    assert len(got) == len(ref) == 4
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(g.indices, r.indices)
        np.testing.assert_array_equal(g.distances, r.distances)


def test_mesh_serving_pipeline_one_dispatch_per_batch():
    # The fused step must be a single jit callable (encode + pack + sharded
    # scan in one dispatch), not an eager per-op shard_map.
    from hashgan_tpu.index import ServingPipeline
    from hashgan_tpu.parallel import make_mesh

    pipe = ServingPipeline(_mk_engine(make_mesh(2)), k=5, interpret=True)
    rng = np.random.default_rng(1)
    b = rng.integers(0, 255, (4, 16, 16, 3)).astype(np.uint8)
    pipe.submit(b)
    assert len(pipe._inflight) == 1
    res = pipe.drain()
    assert res.indices.shape == (4, 5)


def test_calibrated_presets():
    from hashgan_tpu.configs import get_config

    c1 = get_config("config1_cal")
    assert c1.data.n_classes == 100 and not c1.use_gan
    base = get_config("config1")
    assert c1.data.n_train == base.data.n_train  # same geometry
    c3 = get_config("config3_cal")
    assert c3.data.n_classes == 100 and c3.data.multi_label
    assert c3.data.n_database == get_config("config3").data.n_database


def test_fake_pair_weight_threads_through_encoder_step():
    """fake_pair_weight=0 must make the gan-augmented step's pair gradient
    equal the real-only pair structure: pair_nll matches a run whose fake
    pairs carry no weight, and differs from the uniform-weight run."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from hashgan_tpu.configs import (
        Config, DataConfig, EncoderConfig, GanConfig, TrainConfig,
    )
    from hashgan_tpu.data import make_splits
    from hashgan_tpu.data.pipeline import BatchIterator
    from hashgan_tpu.models import Discriminator, Generator, SmallCNNEncoder
    from hashgan_tpu.train import (
        create_encoder_state, create_gan_state, make_encoder_train_step,
    )

    def cfg_with(w):
        return Config(
            data=DataConfig(n_train=64, n_query=16, n_database=64,
                            n_classes=4),
            gan=GanConfig(dim=16, z_dim=32, n_critic=2, iters=10),
            encoder=EncoderConfig(arch="small_cnn", bits=16, lr=1e-3),
            train=TrainConfig(batch_size=16, fake_ratio=0.5,
                              fake_pair_weight=w),
            use_gan=True,
        )

    cfg = cfg_with(1.0)
    splits = make_splits(cfg.data)
    enc = SmallCNNEncoder(bits=cfg.encoder.bits, dim=16)
    gen = Generator(image_size=32, n_labels=4, dim=16)
    disc = Discriminator(image_size=32, n_labels=4, dim=16)
    gstate = create_gan_state(
        jax.random.key(0), gen, disc, cfg.gan, (32, 32, 3), 4)
    imgs, labs = next(
        BatchIterator(splits["train"], cfg.train.batch_size, seed=0))

    def run(w):
        step = make_encoder_train_step(enc, cfg_with(w), generator=gen)
        state = create_encoder_state(
            jax.random.key(1), enc, cfg.encoder, (32, 32, 3))
        _, metrics = step(state, jnp.asarray(imgs), jnp.asarray(labs),
                          jax.random.key(2), gstate.g_params, gstate.g_stats)
        return float(metrics["pair_nll"])

    uniform, discounted = run(1.0), run(0.0)
    assert uniform != discounted  # the knob reaches the loss
