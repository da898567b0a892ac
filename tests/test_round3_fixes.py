"""Round-3 fix coverage: sentinel-label masking at the serving surface,
vectorized pair-balanced partner sampling, and the g_ema_stats checkpoint
migration."""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np

from hashgan_tpu.configs import (
    Config, DataConfig, EncoderConfig, GanConfig, TrainConfig,
)


# ----------------------------------------------------------------------------
# VERDICT r2 weak #1: padding sentinels must not surface real labels
# ----------------------------------------------------------------------------

def test_query_sentinel_labels_masked():
    from hashgan_tpu.index import build_gallery
    from hashgan_tpu.index.engine import QueryEngine
    from hashgan_tpu.models.encoders import build_encoder

    rng = np.random.default_rng(0)
    n, bits, k = 10, 32, 24
    codes = np.where(rng.uniform(size=(n, bits)) < 0.5, -1.0, 1.0).astype(np.float32)
    labels = np.eye(4, dtype=np.float32)[rng.integers(0, 4, n)]
    gal = build_gallery(jnp.asarray(codes), labels, bits, use_pallas=False)
    eng = QueryEngine(build_encoder("small_cnn", bits), None, gal)
    q = np.where(rng.uniform(size=(3, bits)) < 0.5, -1.0, 1.0).astype(np.float32)
    res = eng.query_codes(jnp.asarray(q), k=k, with_labels=True)
    sent = res.indices >= n
    assert sent.any(), "under-filled gallery must return sentinels"
    # sentinel slots carry NO real labels
    assert (res.labels[sent] == 0).all()
    # valid slots still carry the right labels
    valid = ~sent
    np.testing.assert_array_equal(
        res.labels[valid], labels[res.indices[valid]]
    )


# ----------------------------------------------------------------------------
# ADVICE r2: vectorized pair-balanced partner sampling
# ----------------------------------------------------------------------------

def test_pair_balanced_partners_share_labels_and_are_step_pure():
    from hashgan_tpu.data.pipeline import BatchIterator
    from hashgan_tpu.data.synthetic import SyntheticImageDataset

    rng = np.random.default_rng(1)
    n, k_cls = 200, 6
    labels = (rng.uniform(size=(n, k_cls)) < 0.25).astype(np.float32)
    labels[:3] = 0.0  # some items with no active labels
    ds = SyntheticImageDataset(
        images=rng.integers(0, 255, (n, 8, 8, 3)).astype(np.uint8),
        labels=labels,
    )
    it = BatchIterator(ds, 32, seed=7, pair_balanced=True)
    imgs, labs = it.batch(5)
    assert labs.shape == (32, k_cls)
    # second half partners the first half: every pair shares an active
    # label unless the anchor has none (self-partner)
    half = 16
    for j in range(half):
        a, p = labs[j], labs[half + j]
        if a.sum() == 0:
            np.testing.assert_array_equal(a, p)
        else:
            assert (a * p).sum() > 0, (j, a, p)
    # step-pure: same (seed, step) -> identical batch, across iterators
    it2 = BatchIterator(ds, 32, seed=7, pair_balanced=True)
    imgs2, labs2 = it2.batch(5)
    np.testing.assert_array_equal(imgs, imgs2)
    np.testing.assert_array_equal(labs, labs2)
    # different steps differ
    assert not np.array_equal(it.batch(6)[0], imgs)


def test_pair_balanced_on_singleton_classes():
    """Items whose only active class is a singleton must partner with
    themselves (the only same-label example), not crash."""
    from hashgan_tpu.data.pipeline import BatchIterator
    from hashgan_tpu.data.synthetic import SyntheticImageDataset

    rng = np.random.default_rng(2)
    n, k_cls = 8, 8
    labels = np.eye(k_cls, dtype=np.float32)[:n]  # every class a singleton
    ds = SyntheticImageDataset(
        images=rng.integers(0, 255, (n, 8, 8, 3)).astype(np.uint8),
        labels=labels,
    )
    it = BatchIterator(ds, 8, seed=3, pair_balanced=True)
    _, labs = it.batch(0)
    half = 4
    for j in range(half):
        assert (labs[j] * labs[half + j]).sum() > 0


# ----------------------------------------------------------------------------
# ADVICE r2: checkpoints written before g_ema_stats must still restore
# ----------------------------------------------------------------------------

def test_restore_migrates_missing_g_ema_stats(tmp_path):
    from hashgan_tpu.train.loop import Experiment

    cfg = Config(
        data=DataConfig(n_train=32, n_query=8, n_database=32, n_classes=4),
        gan=GanConfig(dim=16, z_dim=32, n_critic=2, iters=100, ema_decay=0.5),
        encoder=EncoderConfig(arch="small_cnn", bits=16),
        train=TrainConfig(batch_size=8, workdir=str(tmp_path)),
        use_gan=True,
    )
    exp = Experiment(cfg, workdir=str(tmp_path))
    assert exp.gan_state.g_ema_stats is not None
    # Emulate a pre-g_ema_stats checkpoint: save with that subtree absent.
    old_state = jax.device_get({
        "encoder": exp.encoder_state,
        "gan": exp.gan_state.replace(g_ema_stats=None),
    })
    exp.ckpt.save(1, old_state)

    exp2 = Experiment(cfg, workdir=str(tmp_path))
    assert exp2.restore_checkpoint()
    # migration seeds the EMA stats from the restored live stats
    assert exp2.gan_state.g_ema_stats is not None
    for a, b in zip(
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, exp2.gan_state.g_ema_stats)),
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, exp2.gan_state.g_stats)),
    ):
        np.testing.assert_array_equal(a, b)


# ----------------------------------------------------------------------------
# ServingPipeline: fused-step double-buffered serving
# ----------------------------------------------------------------------------

def test_serving_pipeline_matches_query_engine():
    from hashgan_tpu.index import QueryEngine, ServingPipeline, build_gallery
    from hashgan_tpu.models.encoders import build_encoder

    rng = np.random.default_rng(4)
    n, bits, k, batch = 500, 32, 10, 8
    codes = np.where(rng.uniform(size=(n, bits)) < 0.5, -1.0, 1.0).astype(np.float32)
    labels = np.eye(2, dtype=np.float32)[np.zeros(n, int)]
    gal = build_gallery(jnp.asarray(codes), labels, bits, use_pallas=False)
    enc = build_encoder("small_cnn", bits)
    dummy = jnp.zeros((2, 16, 16, 3), jnp.float32)
    params = enc.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        dummy, train=False,
    )["params"]
    eng = QueryEngine(enc, params, gal)
    pipe = ServingPipeline(eng, k=k, depth=2, interpret=True)
    batches = [
        rng.integers(0, 255, (batch, 16, 16, 3)).astype(np.uint8)
        for _ in range(5)
    ]
    results = list(pipe.map_batches(batches))
    assert len(results) == 5
    # results arrive in submission order and match the unfused engine path
    for b, res in zip(batches, results):
        ref = eng.query_images(b, k=k)
        np.testing.assert_array_equal(res.indices, ref.indices)
        np.testing.assert_array_equal(res.distances, ref.distances)


def test_serving_pipeline_rejects_ungrouped():
    # Round 4 made mesh galleries first-class in ServingPipeline
    # (tests/test_round4_fixes.py); what still refuses is a gallery with no
    # grouped layout (over-capacity -> slab engine only).
    import dataclasses as _dc

    import pytest as _pytest

    from hashgan_tpu.index import QueryEngine, ServingPipeline, build_gallery
    from hashgan_tpu.models.encoders import build_encoder
    from hashgan_tpu.parallel import make_mesh

    rng = np.random.default_rng(5)
    codes = np.where(rng.uniform(size=(300, 32)) < 0.5, -1.0, 1.0).astype(np.float32)
    labels = np.zeros((300, 1), np.float32)
    enc = build_encoder("small_cnn", 32)
    gal_mesh = build_gallery(jnp.asarray(codes), labels, 32,
                             mesh=make_mesh(2), use_pallas=False)
    gal_ungrouped = _dc.replace(gal_mesh, gallery_grouped=None)
    with _pytest.raises(ValueError, match="grouped layout"):
        ServingPipeline(QueryEngine(enc, None, gal_ungrouped))


# ----------------------------------------------------------------------------
# Device-side incremental index maintenance
# ----------------------------------------------------------------------------

def test_device_extend_remove_bit_identical_to_host_build():
    from hashgan_tpu.index import build_gallery
    from hashgan_tpu.index.gallery import build_gallery_from_packed
    from hashgan_tpu.ops import pack_codes_np

    rng = np.random.default_rng(9)
    bits = 32
    codes_a = np.where(rng.uniform(size=(300, bits)) < 0.5, -1.0, 1.0).astype(np.float32)
    codes_b = np.where(rng.uniform(size=(80, bits)) < 0.5, -1.0, 1.0).astype(np.float32)
    lab_a = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 300)]
    lab_b = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 80)]

    gal = build_gallery(jnp.asarray(codes_a), lab_a, bits, use_pallas=False)
    assert gal._device_resident()
    ext = gal.extend(jnp.asarray(codes_b), lab_b, use_pallas=False)
    # reference: host rebuild from the concatenated canonical codes
    ref = build_gallery_from_packed(
        np.concatenate([pack_codes_np(codes_a), pack_codes_np(codes_b)]),
        np.concatenate([lab_a, lab_b]), bits,
    )
    assert ext.n == ref.n == 380
    np.testing.assert_array_equal(np.asarray(ext.gallery_t),
                                  np.asarray(ref.gallery_t))
    np.testing.assert_array_equal(np.asarray(ext.gallery_grouped),
                                  np.asarray(ref.gallery_grouped))
    np.testing.assert_array_equal(np.asarray(ext.canon_bg),
                                  np.asarray(ref.canon_bg))
    np.testing.assert_array_equal(np.asarray(ext.packed_canonical),
                                  np.asarray(ref.packed_canonical))
    np.testing.assert_array_equal(ext.labels, ref.labels)

    # remove: device gather path, id map translates, layouts match host
    removed, keep = ext.remove([0, 5, 379])
    ref2 = build_gallery_from_packed(
        np.asarray(ref.packed_canonical)[:380][keep], ref.labels[keep], bits,
    )
    np.testing.assert_array_equal(np.asarray(removed.gallery_grouped),
                                  np.asarray(ref2.gallery_grouped))
    assert removed.n == 377 and keep.shape == (377,)


def test_serving_pipeline_large_k_path():
    """k > 256 inside the fused serving step routes through mxu_topk_large
    and stays exact vs the unfused engine."""
    from hashgan_tpu.index import QueryEngine, ServingPipeline, build_gallery
    from hashgan_tpu.models.encoders import build_encoder

    rng = np.random.default_rng(6)
    n, bits, k, batch = 600, 32, 400, 4
    codes = np.where(rng.uniform(size=(n, bits)) < 0.5, -1.0, 1.0).astype(np.float32)
    labels = np.zeros((n, 1), np.float32)
    gal = build_gallery(jnp.asarray(codes), labels, bits, use_pallas=False)
    enc = build_encoder("small_cnn", bits)
    params = enc.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((2, 16, 16, 3), jnp.float32), train=False,
    )["params"]
    eng = QueryEngine(enc, params, gal)
    pipe = ServingPipeline(eng, k=k, depth=2, interpret=True)
    b = rng.integers(0, 255, (batch, 16, 16, 3)).astype(np.uint8)
    res = list(pipe.map_batches([b]))[0]
    ref = eng.query_images(b, k=k)
    np.testing.assert_array_equal(res.indices, ref.indices)
    np.testing.assert_array_equal(res.distances, ref.distances)


def test_encoder_decay_lr_schedule():
    """EncoderConfig.decay_lr: lr decays linearly to 0 over cfg.iters —
    late-step updates shrink toward zero (reference-horizon schedule)."""
    import optax

    from hashgan_tpu.configs import EncoderConfig
    from hashgan_tpu.train.state import make_encoder_tx

    cfg = EncoderConfig(lr=1e-2, hash_lr_multiplier=1.0, iters=10,
                        decay_lr=True)
    tx = make_encoder_tx(cfg)
    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.ones((3,))}
    state = tx.init(params)
    sizes = []
    for _ in range(10):
        updates, state = tx.update(grads, state, params)
        sizes.append(float(jnp.abs(updates["w"]).max()))
    # monotone shrink toward 0; final step's lr is ~1/10th of the first's
    assert sizes[-1] < sizes[0] * 0.2, sizes
    # constant-lr control does not shrink
    tx_c = make_encoder_tx(EncoderConfig(lr=1e-2, hash_lr_multiplier=1.0))
    state_c = tx_c.init(params)
    sizes_c = []
    for _ in range(10):
        updates, state_c = tx_c.update(grads, state_c, params)
        sizes_c.append(float(jnp.abs(updates["w"]).max()))
    assert sizes_c[-1] > sizes_c[0] * 0.9, sizes_c


def test_sharded_scan_jit_cache_reuses_compiled_fn():
    """sharded_* engines memoize their jit-of-shard_map: repeated calls with
    the same static config must reuse one cache entry (an un-jitted
    shard_map dispatches eagerly — measured 20.6s vs 34.5ms on the real
    chip, docs/BENCHMARKS.md round 3)."""
    from hashgan_tpu.parallel import sharded_scan as ss
    from hashgan_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(3)
    mesh = make_mesh(2)
    n, w = 512, 1
    pg = rng.integers(0, 2**32, (n, w), dtype=np.uint32)
    pq = jnp.asarray(rng.integers(0, 2**32, (4, w), dtype=np.uint32))
    grouped, canon, valids, canon_bg, _ = ss.shard_grouped_gallery(
        mesh, pg, groups=4, col_multiple=16
    )
    before = len(ss._SHARD_FN_CACHE)
    d1, i1 = ss.sharded_mxu_topk(
        mesh, pq, grouped, canon_bg, valids, n=n, k=5,
        query_tile=4, col_block=16, interpret=True)
    mid = len(ss._SHARD_FN_CACHE)
    d2, i2 = ss.sharded_mxu_topk(
        mesh, pq, grouped, canon_bg, valids, n=n, k=5,
        query_tile=4, col_block=16, interpret=True)
    after = len(ss._SHARD_FN_CACHE)
    assert mid == before + 1 and after == mid  # one entry, reused
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    # a different static config gets its own entry
    ss.sharded_mxu_topk(
        mesh, pq, grouped, canon_bg, valids, n=n, k=7,
        query_tile=4, col_block=16, interpret=True)
    assert len(ss._SHARD_FN_CACHE) == after + 1


# ----------------------------------------------------------------------------
# round-3 live-run finding: exact tanh saturation must warn, once
# ----------------------------------------------------------------------------

def test_saturation_guard_warns_once_and_only_when_saturated():
    import types
    import warnings

    from hashgan_tpu.train.loop import Experiment

    host = types.SimpleNamespace()
    dead = {"quantization": 0.0, "code_abs_mean": 1.0}
    healthy = {"quantization": 3e-4, "code_abs_mean": 0.98}

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        Experiment._saturation_guard(host, 100, healthy)
        assert len(w) == 0
        Experiment._saturation_guard(host, 200, dead)
        assert len(w) == 1 and "saturated" in str(w[0].message)
        # warns once per experiment, not per log line
        Experiment._saturation_guard(host, 300, dead)
        assert len(w) == 1


# ----------------------------------------------------------------------------
# round-3 live-run finding #2: hash_lr_multiplier 1 <-> !=1 changes the optax
# chain structure; restore must migrate, carrying Adam moments bit-exactly
# ----------------------------------------------------------------------------

def test_restore_migrates_across_hash_lr_multiplier_structures(tmp_path):
    import numpy as np

    from hashgan_tpu.configs import get_config
    from hashgan_tpu.train.loop import Experiment

    def cfg_with(mult):
        cfg = get_config("config1")
        return dc.replace(
            cfg,
            data=dc.replace(cfg.data, n_train=48, n_query=16, n_database=48),
            encoder=dc.replace(cfg.encoder, hash_lr_multiplier=mult),
            train=dc.replace(cfg.train, batch_size=8, workdir=str(tmp_path)),
        )

    a = Experiment(cfg_with(10.0))
    a.train_encoder(2, eval_during=False)
    a.save_checkpoint()

    b = Experiment(cfg_with(1.0))
    assert b.restore_checkpoint()
    assert int(jax.device_get(b.encoder_state.step)) == 2
    # chain(adam, masked(scale)) state [0] IS the plain adam state
    m_a = jax.tree_util.tree_leaves(a.encoder_state.opt_state[0])
    m_b = jax.tree_util.tree_leaves(b.encoder_state.opt_state)
    assert len(m_a) == len(m_b)
    for x, y in zip(m_a, m_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # and back: plain adam -> wrapped chain
    b.train_encoder(1, eval_during=False)
    b.save_checkpoint()
    c = Experiment(cfg_with(10.0))
    assert c.restore_checkpoint()
    assert int(jax.device_get(c.encoder_state.step)) == 3
    m_c = jax.tree_util.tree_leaves(c.encoder_state.opt_state[0])
    m_b2 = jax.tree_util.tree_leaves(b.encoder_state.opt_state)
    for x, y in zip(m_b2, m_c):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_from_scratch_alexnet_10x_warns_before_training(tmp_path):
    import warnings

    from hashgan_tpu.configs import get_config
    from hashgan_tpu.train.loop import Experiment

    cfg = get_config("config3")  # alexnet, multiplier 10, no pretrained npy
    cfg = dc.replace(
        cfg,
        use_gan=False,
        data=dc.replace(cfg.data, n_train=32, n_query=8, n_database=32,
                        image_size=16),
        encoder=dc.replace(cfg.encoder, input_resize=67, resize_base=72),
        train=dc.replace(cfg.train, batch_size=8, workdir=str(tmp_path),
                         log_every=1000, eval_every=1 << 30,
                         checkpoint_every=1 << 30),
    )
    exp = Experiment(cfg)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        exp.train_encoder(1, eval_during=False)
    assert any("tanh saturation" in str(x.message) for x in w)
