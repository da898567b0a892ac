import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-loop integration tests; -m 'not slow' skips

TINY_YAML = """
preset: config1
data: {{n_train: 96, n_query: 24, n_database: 160, n_classes: 4}}
encoder: {{bits: 32, iters: 25}}
train: {{batch_size: 16, log_every: 10, eval_every: 100000, checkpoint_every: 100000, workdir: "{wd}"}}
eval: {{R: 50}}
"""


@pytest.fixture
def tiny_yaml(tmp_path):
    p = tmp_path / "tiny.yaml"
    p.write_text(TINY_YAML.format(wd=str(tmp_path / "wd")))
    return str(p)


def test_experiment_train_eval_index_query(tiny_yaml, tmp_path):
    from hashgan_tpu.configs import load_yaml
    from hashgan_tpu.train.loop import Experiment

    cfg = load_yaml(tiny_yaml)
    exp = Experiment(cfg)
    exp.train_encoder(iters=25, eval_during=False)
    metrics = exp.evaluate()
    assert 0.0 <= metrics["map_at_50"] <= 1.0
    gal = exp.build_index(save_path=str(tmp_path / "g.npz"))
    assert gal.n == 160
    # query roundtrip through the saved artifact
    from hashgan_tpu.index import PackedGallery
    import jax.numpy as jnp
    from hashgan_tpu.ops.pack import pack_codes

    gal2 = PackedGallery.load(str(tmp_path / "g.npz"))
    codes_q = exp.encode_split("query")
    d, i = gal2.topk(pack_codes(jnp.asarray(codes_q), use_pallas=False),
                     k=5, use_pallas=False)
    assert np.asarray(i).shape == (24, 5)
    assert (np.asarray(i) < 160).all()


def test_experiment_gan_smoke(tmp_path):
    """One GAN cycle + one co-trained encoder step on CPU (tiny dims)."""
    from hashgan_tpu.configs import (
        Config, DataConfig, EncoderConfig, GanConfig, TrainConfig,
    )
    from hashgan_tpu.train.loop import Experiment

    cfg = Config(
        data=DataConfig(n_train=64, n_query=8, n_database=32, n_classes=4),
        gan=GanConfig(dim=8, z_dim=16, n_critic=2, iters=4,
                      compute_dtype="float32"),
        encoder=EncoderConfig(arch="small_cnn", bits=16,
                              compute_dtype="float32"),
        train=TrainConfig(batch_size=8, log_every=2, sample_every=2,
                          checkpoint_every=100000,
                          workdir=str(tmp_path / "wd")),
        use_gan=True,
    )
    exp = Experiment(cfg)
    means = exp.train_gan(iters=4)
    assert np.isfinite(means["g_loss"]) and np.isfinite(means["d_loss"])
    exp.train_encoder(iters=3, eval_during=False)
    # sample grid was dumped
    assert any(f.startswith("samples_") for f in os.listdir(exp.workdir))


def test_cli_train_build_query(tiny_yaml, tmp_path, capsys):
    from hashgan_tpu.cli import main

    main(["train", "--config", tiny_yaml, "--stage", "2", "--iters", "10"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    metrics = json.loads(out)
    assert "map_at_50" in metrics

    gal_path = str(tmp_path / "gal.npz")
    main(["build-index", "--config", tiny_yaml, "--out", gal_path])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out)["items"] == 160

    main(["query", "--gallery", gal_path, "--k", "3", "--n-queries", "2"])
    lines = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(lines[0])
    assert len(rec["neighbors"]) == 3


def test_cli_eval_and_encode(tiny_yaml, tmp_path, capsys):
    from hashgan_tpu.cli import main

    main(["train", "--config", tiny_yaml, "--stage", "2", "--iters", "5"])
    capsys.readouterr()
    main(["eval", "--config", tiny_yaml])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "map_at_50" in out

    codes_path = str(tmp_path / "codes.npz")
    main(["encode", "--config", tiny_yaml, "--split", "query",
          "--out", codes_path])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["n"] == 24
    z = np.load(codes_path)
    assert z["codes"].shape == (24, 32)
    assert z["packed"].shape == (24, 1)


def test_cli_yaml_preset_roundtrip(tiny_yaml):
    from hashgan_tpu.configs import load_yaml

    cfg = load_yaml(tiny_yaml)
    assert cfg.data.n_train == 96
    assert cfg.encoder.bits == 32
    assert cfg.use_gan is False  # from config1 preset
