import numpy as np

from hashgan_tpu.configs import DataConfig
from hashgan_tpu.data import (
    BatchIterator,
    make_splits,
    parse_list_file,
    write_list_file,
)
from hashgan_tpu.data.pipeline import epoch_batches


def test_list_file_roundtrip(tmp_path):
    paths = ["a/0.png", "b/1.png", "c/2.png"]
    labels = np.array([[1, 0, 0], [0, 1, 0], [0, 1, 1]], dtype=np.float32)
    p = tmp_path / "train.txt"
    write_list_file(str(p), paths, labels)
    paths2, labels2 = parse_list_file(str(p))
    assert paths2 == paths
    np.testing.assert_array_equal(labels2, labels)


def test_synthetic_splits_share_templates():
    cfg = DataConfig(n_train=64, n_query=32, n_database=128, n_classes=5)
    splits = make_splits(cfg)
    assert splits["train"].images.shape == (64, 32, 32, 3)
    assert splits["train"].images.dtype == np.uint8
    assert splits["query"].labels.shape == (32, 5)
    # one-hot labels
    assert (splits["database"].labels.sum(axis=1) == 1).all()


def test_synthetic_multilabel():
    cfg = DataConfig(n_train=32, n_query=8, n_database=16, n_classes=7, multi_label=True)
    splits = make_splits(cfg)
    s = splits["train"].labels.sum(axis=1)
    assert (s >= 1).all() and (s <= 3).all()


def test_batch_iterator_deterministic_resume():
    cfg = DataConfig(n_train=100, n_query=8, n_database=16)
    ds = make_splits(cfg)["train"]
    it1 = BatchIterator(ds, batch_size=16, seed=3)
    batches = [next(it1) for _ in range(5)]
    # resume from step 3 reproduces batches 3, 4
    it2 = BatchIterator(ds, batch_size=16, seed=3, start_step=3)
    for expect in batches[3:]:
        got = next(it2)
        np.testing.assert_array_equal(got[0], expect[0])
        np.testing.assert_array_equal(got[1], expect[1])


def test_epoch_batches_padding():
    cfg = DataConfig(n_train=70, n_query=8, n_database=16)
    ds = make_splits(cfg)["train"]
    total = 0
    for imgs, labs, mask in epoch_batches(ds, 32):
        assert imgs.shape[0] == 32
        total += mask.sum()
    assert total == 70
