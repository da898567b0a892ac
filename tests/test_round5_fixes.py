"""Round-5 fixes: the four ADVICE r4 findings + the projection-free
Wasserstein readout (VERDICT r4 "what's weak" #3) + the config2_cal
preset / PHASES plumbing for the round-5 scarce-delta experiments."""

import dataclasses
import importlib
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest


# ---------------------------------------------------------------------------
# ADVICE r4 #1: multi-label device generation with n_classes < 3 must route
# to the numpy path instead of crashing the auto-router.
# ---------------------------------------------------------------------------

def test_use_device_gen_multilabel_guard(monkeypatch):
    from hashgan_tpu.configs import DataConfig
    from hashgan_tpu.data.synthetic import _use_device_gen

    monkeypatch.delenv("HASHGAN_SYNTH_DEVICE", raising=False)
    big = dict(image_size=64, n_train=10, n_query=10, n_database=10_000_000)
    assert _use_device_gen(DataConfig(multi_label=True, n_classes=2, **big)) \
        is False
    # sanity: the same geometry WITH enough classes still auto-routes
    assert _use_device_gen(DataConfig(multi_label=True, n_classes=21, **big))
    assert _use_device_gen(DataConfig(multi_label=False, n_classes=2, **big))


# ---------------------------------------------------------------------------
# ADVICE r4 #2: fullkey kernels must not rely on int32 wraparound for pad
# lanes. An all-pad gallery tail exercises the clamped path; results must
# match the jnp oracle bit-for-bit (interpret mode).
# ---------------------------------------------------------------------------

def test_fullkey_scan_pad_lanes_no_overflow():
    from hashgan_tpu.ops import hamming_distance_np, pack_codes_np
    from hashgan_tpu.ops.groupmin import to_grouped_layout
    from hashgan_tpu.ops.mxu_scan import mxu_topk, to_group_major

    rng = np.random.default_rng(0)
    bits, n, q, k = 32, 70, 4, 8  # n far below one col block => pad lanes
    codes = np.where(
        rng.uniform(size=(n, bits)) < 0.5, -1.0, 1.0).astype(np.float32)
    queries = np.where(
        rng.uniform(size=(q, bits)) < 0.5, -1.0, 1.0).astype(np.float32)
    packed = pack_codes_np(codes)
    gg = jnp.asarray(to_grouped_layout(packed, groups=8, col_multiple=16))
    bg = to_group_major(packed, groups=8, col_multiple=16)
    c, L, w = bg.shape
    d, i = mxu_topk(jnp.asarray(pack_codes_np(queries)), gg,
                    jnp.asarray(bg.reshape(c, L * w)), valid_n=n, k=k,
                    query_tile=16, col_block=16, interpret=True)
    d_full = hamming_distance_np(pack_codes_np(queries), packed)
    for qi in range(q):
        order = np.argsort(d_full[qi], kind="stable")[:k]
        np.testing.assert_array_equal(np.asarray(i)[qi], order)
        np.testing.assert_array_equal(np.asarray(d)[qi], d_full[qi][order])


# ---------------------------------------------------------------------------
# ADVICE r4 #3: list-file provenance is a CONTENT fingerprint, not a path.
# ---------------------------------------------------------------------------

def test_provenance_content_fingerprint(tmp_path):
    from hashgan_tpu.configs import get_config
    from hashgan_tpu.train.loop import Experiment

    lst = tmp_path / "a" / "train.txt"
    lst.parent.mkdir()
    lst.write_text("img0.png 0 1\nimg1.png 1 0\n")
    cfg = get_config("config1")

    def prov(path):
        exp = object.__new__(Experiment)  # _data_provenance uses cfg only
        exp.cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, train_list=str(path)))
        return Experiment._data_provenance(exp)

    p1 = prov(lst)
    assert p1.startswith("lists:") and str(lst) not in p1
    # moving identical content to a new path keeps the id
    moved = tmp_path / "b" / "train.txt"
    moved.parent.mkdir()
    moved.write_bytes(lst.read_bytes())
    assert prov(moved) == p1
    # editing in place at the same path changes it
    lst.write_text("img0.png 0 1\nimgX.png 1 0\n")
    assert prov(lst) != p1


# ---------------------------------------------------------------------------
# ADVICE r4 #4: ServingPipeline derives (has_pm8, n) from the CURRENT
# gallery tuple at submit — a gallery rebuilt with a pm8 copy after
# construction must serve correctly, not hit a stale-arity compiled step.
# ---------------------------------------------------------------------------

def _mk_engine(mesh, n=200, bits=32, seed=4, build_pm8=False):
    from hashgan_tpu.index import QueryEngine, build_gallery
    from hashgan_tpu.models.encoders import build_encoder

    rng = np.random.default_rng(seed)
    codes = np.where(
        rng.uniform(size=(n, bits)) < 0.5, -1.0, 1.0).astype(np.float32)
    labels = np.eye(2, dtype=np.float32)[np.zeros(n, int)]
    gal = build_gallery(jnp.asarray(codes), labels, bits, mesh=mesh,
                        use_pallas=False, build_pm8=build_pm8)
    enc = build_encoder("small_cnn", bits)
    dummy = jnp.zeros((2, 16, 16, 3), jnp.float32)
    params = enc.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        dummy, train=False,
    )["params"]
    return QueryEngine(enc, params, gal)


def test_mesh_pipeline_gallery_pm8_swap():
    from hashgan_tpu.index import ServingPipeline
    from hashgan_tpu.parallel import make_mesh

    mesh = make_mesh(2)
    pipe = ServingPipeline(_mk_engine(mesh), k=5, interpret=True)
    rng = np.random.default_rng(1)
    b = rng.integers(0, 255, (4, 16, 16, 3)).astype(np.uint8)
    pipe.submit(b)
    first = pipe.drain()
    # swap in a gallery REBUILT with a pm8 copy (same codes): arity changes
    swapped = _mk_engine(mesh, build_pm8=True)
    assert swapped.gallery.gallery_grouped[4] is not None, \
        "fixture should build a pm8 copy"
    pipe.engine.gallery = swapped.gallery
    pipe.engine.params = swapped.params
    pipe.submit(b)
    second = pipe.drain()
    np.testing.assert_array_equal(second.indices, first.indices)
    np.testing.assert_array_equal(second.distances, first.distances)


# ---------------------------------------------------------------------------
# VERDICT r4 weak #3: projection arms log a projection-free W readout.
# ---------------------------------------------------------------------------

def _tiny_gan_cfg(d_projection):
    from hashgan_tpu.configs import get_config

    cfg = get_config("config2")
    return dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, image_size=32, n_classes=4, n_train=64, n_query=8,
            n_database=32),
        gan=dataclasses.replace(
            cfg.gan, dim=8, z_dim=8, n_critic=2, iters=2,
            d_projection=d_projection, compute_dtype="float32"),
        train=dataclasses.replace(cfg.train, batch_size=4),
    )


@pytest.mark.parametrize("proj", [False, True])
def test_wasserstein_noproj_metric(proj):
    from hashgan_tpu.models.gan import Discriminator, Generator
    from hashgan_tpu.train.gan_step import make_gan_cycle
    from hashgan_tpu.train.state import create_gan_state

    cfg = _tiny_gan_cfg(proj)
    gen = Generator(image_size=32, n_labels=4, dim=8, dtype=jnp.float32)
    disc = Discriminator(image_size=32, n_labels=4, dim=8,
                         dtype=jnp.float32, projection=proj)
    state = create_gan_state(jax.random.key(0), gen, disc, cfg.gan,
                             image_shape=(32, 32, 3), n_labels=4)
    cycle = make_gan_cycle(gen, disc, cfg)
    imgs = jnp.zeros((cfg.gan.n_critic + 1, 4, 32, 32, 3), jnp.uint8)
    labs = jnp.tile(jnp.eye(4, dtype=jnp.float32)[:4][None],
                    (cfg.gan.n_critic + 1, 1, 1))
    _state, metrics = cycle(state, imgs, labs, jax.random.key(1))
    if proj:
        assert "wasserstein_noproj" in metrics
        assert np.isfinite(float(metrics["wasserstein_noproj"]))
    else:
        assert "wasserstein_noproj" not in metrics


# ---------------------------------------------------------------------------
# Round-5 experiment plumbing: config2_cal preset + horizon-runner PHASES.
# ---------------------------------------------------------------------------

def _fresh(module: str, monkeypatch, **env):
    for k in ("ENCODER_ARCH", "GAN_CYCLES", "ENC_ITERS", "SMOKE", "PHASES",
              "CONFIG_PRESET", "RUN_TAG", "GAN_JSON", "TRAIN_JSON",
              "SCARCE_TRAIN", "SKIP_ABLATION"):
        monkeypatch.delenv(k, raising=False)
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    sys.modules.pop(module, None)
    return importlib.import_module(module)


def test_config2_cal_preset():
    from hashgan_tpu.configs import get_config

    cal = get_config("config2_cal")
    base = get_config("config2")
    assert cal.use_gan and not cal.data.multi_label
    assert cal.data.n_classes == 100
    assert cal.data.n_train == base.data.n_train  # same geometry
    assert cal.eval.R == 1000  # calibrated protocol (bit-sweep scale)


def test_horizon_runner_phases_and_preset(monkeypatch):
    m = _fresh("scripts.run_config3_ref_horizon", monkeypatch,
               CONFIG_PRESET="config2_cal", PHASES="stage1",
               SCARCE_TRAIN="1000", RUN_TAG="proj")
    assert m.PHASES == ("stage1",)
    assert os.path.basename(m.ROOT) == \
        "config3_ref_horizon_config2_cal_scarce1000_proj"
    cfg = m.base_config("cotrain")
    assert cfg.data.n_classes == 100 and not cfg.data.multi_label
    assert cfg.data.n_train == 1000
    # config3_cal keeps its round-4 root name
    m = _fresh("scripts.run_config3_ref_horizon", monkeypatch,
               CONFIG_PRESET="config3_cal", SCARCE_TRAIN="2000")
    assert os.path.basename(m.ROOT) == "config3_ref_horizon_cal_scarce2000"
    assert m.PHASES == ("stage1", "cotrain", "realonly")


def test_sweep_ranking_prefers_noproj(monkeypatch):
    m = _fresh("scripts.run_config3_stage1_sweep", monkeypatch)
    arms = {
        "plain": {"w_tail": 50.0, "w_noproj_tail": None},
        "proj": {"w_tail": 36.0, "w_noproj_tail": 80.0},
    }
    # mirror of main()'s ranking logic: the proj arm must rank by its
    # projection-free readout (80), not its mixed-functional w_tail (36)
    def comparable(v):
        return v["w_tail"] if v.get("w_noproj_tail") is None \
            else v["w_noproj_tail"]

    ranked = sorted((abs(comparable(v)), k) for k, v in arms.items())
    assert [k for _, k in ranked] == ["plain", "proj"]
    assert hasattr(m, "tail_metric")  # module imports cleanly


# ---------------------------------------------------------------------------
# VERDICT r4 weak #1: doc claims must not outrun committed evidence — every
# docs/artifacts/ path cited anywhere in the docs must exist.
# ---------------------------------------------------------------------------

def test_docs_cite_existing_artifacts():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    try:
        from check_docs_vs_artifacts import check
    finally:
        sys.path.pop(0)
    assert check(strict=False) == 0


# ---------------------------------------------------------------------------
# Round-5 fix: the stage-II health guard must judge a PROJECTION stage-I by
# the projection-free readout. Measured in anger (scarce4000 triple): a
# converged projection run ends with wasserstein ~ 11.8 (score includes
# <V y, phi(x)>) but wasserstein_noproj ~ 2.0 — the guard warned
# "unconverged" on a healthy stage-I that went on to deliver +2.0 MAP.
# ---------------------------------------------------------------------------

def test_stage2_guard_prefers_noproj_readout(tmp_path):
    import json
    import warnings

    from hashgan_tpu.configs import (Config, DataConfig, EncoderConfig,
                                     GanConfig, TrainConfig)
    from hashgan_tpu.train.loop import Experiment

    cfg = Config(
        data=DataConfig(n_train=64, n_query=16, n_database=64, n_classes=4),
        gan=GanConfig(dim=16, z_dim=32, n_critic=2, iters=100),
        encoder=EncoderConfig(arch="small_cnn", bits=16, lr=1e-3),
        train=TrainConfig(batch_size=16, fake_ratio=0.5),
        use_gan=True,
    )
    exp = Experiment(cfg, workdir=str(tmp_path), use_mesh=False)
    exp.train_gan(iters=1)

    # projection-style row: inflated raw W, healthy noproj -> no warning
    with open(f"{tmp_path}/metrics.jsonl", "a") as f:
        f.write(json.dumps({"step": 1, "wasserstein": 11.8,
                            "wasserstein_noproj": 2.0}) + "\n")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        use_gan, _ = exp._stage2_guard()
    assert use_gan

    # unhealthy noproj -> warning keyed on the noproj value
    with open(f"{tmp_path}/metrics.jsonl", "a") as f:
        f.write(json.dumps({"step": 2, "wasserstein": 3.0,
                            "wasserstein_noproj": 41.5}) + "\n")
    with pytest.warns(UserWarning, match="41.5"):
        use_gan, _ = exp._stage2_guard()
    assert use_gan
