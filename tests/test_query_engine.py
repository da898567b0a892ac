import pytest

pytestmark = pytest.mark.slow  # full-loop integration tests; -m 'not slow' skips
import numpy as np

from hashgan_tpu.configs import Config, DataConfig, EncoderConfig, TrainConfig


def _cfg(wd):
    return Config(
        data=DataConfig(n_train=64, n_query=8, n_database=64, n_classes=4),
        encoder=EncoderConfig(arch="small_cnn", bits=32),
        train=TrainConfig(batch_size=8, workdir=wd),
        use_gan=False,
    )


def test_query_engine_end_to_end(tmp_path):
    from hashgan_tpu.index.engine import QueryEngine
    from hashgan_tpu.train.loop import Experiment

    cfg = _cfg(str(tmp_path))
    exp = Experiment(cfg)
    exp.train_encoder(iters=5, eval_during=False)
    exp.save_checkpoint()
    gal_path = str(tmp_path / "g.npz")
    exp.build_index(save_path=gal_path)

    engine = QueryEngine.from_artifacts(cfg, str(tmp_path), gal_path)
    imgs = exp.splits["query"].images
    res = engine.query_images(imgs, k=5, with_labels=True)
    assert res.indices.shape == (8, 5)
    assert (res.indices < 64).all()
    assert res.labels.shape == (8, 5, 4)
    # distances ascending per row
    assert (np.diff(res.distances, axis=1) >= 0).all()
    # engine ranking must equal a fresh oracle ranking of the same codes
    from hashgan_tpu.ops import hamming_distance_np, pack_codes_np

    codes_q = np.asarray(engine.encode(imgs))
    codes_db = exp.encode_split("database")
    d = hamming_distance_np(pack_codes_np(codes_q), pack_codes_np(codes_db))
    for qi in range(8):
        order = np.argsort(d[qi], kind="stable")[:5]
        np.testing.assert_array_equal(res.indices[qi], order)
