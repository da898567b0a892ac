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


def test_pair_balanced_batches_guarantee_positive_pairs():
    """Label-conditioned pair sampling (BASELINE config 3): the second half
    of the batch pairs each first-half anchor with a same-label partner."""
    import numpy as np

    from hashgan_tpu.data.pipeline import BatchIterator
    from hashgan_tpu.data.synthetic import make_synthetic

    ds, _ = make_synthetic(200, 21, size=8, multi_label=True, seed=0)
    it = BatchIterator(ds, batch_size=32, seed=5, pair_balanced=True)
    for _ in range(4):
        imgs, labs = next(it)
        half = 16
        anchors, partners = labs[:half], labs[half:]
        shared = (anchors * partners).sum(axis=1)
        assert (shared > 0).all()  # every pair shares >= 1 active label


def test_pair_balanced_is_step_pure_for_resume():
    import numpy as np

    from hashgan_tpu.data.pipeline import BatchIterator
    from hashgan_tpu.data.synthetic import make_synthetic

    ds, _ = make_synthetic(100, 5, size=8, seed=1)
    a = BatchIterator(ds, batch_size=16, seed=9, pair_balanced=True)
    for _ in range(3):
        next(a)
    b = BatchIterator(ds, batch_size=16, seed=9, start_step=3,
                      pair_balanced=True)
    ia, la = next(a)
    ib, lb = next(b)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_array_equal(la, lb)


def test_synth_cache_roundtrip_bit_exact(tmp_path, monkeypatch):
    """Disk-cached splits are bit-identical to fresh generation, and the
    second make_splits call must hit the cache (generation is patched to
    explode after the first call)."""
    import hashgan_tpu.data.synthetic as syn

    monkeypatch.setenv("HASHGAN_SYNTH_CACHE", str(tmp_path / "cache"))
    cfg = DataConfig(n_train=24, n_query=8, n_database=40, n_classes=4,
                     image_size=16)
    fresh = make_splits(cfg)
    assert (tmp_path / "cache").exists()

    def boom(*a, **k):
        raise AssertionError("cache miss: make_synthetic re-invoked")

    monkeypatch.setattr(syn, "make_synthetic", boom)
    cached = make_splits(cfg)
    for split in ("train", "query", "database"):
        np.testing.assert_array_equal(cached[split].images,
                                      fresh[split].images)
        np.testing.assert_array_equal(cached[split].labels,
                                      fresh[split].labels)
    np.testing.assert_array_equal(cached["train"].templates,
                                  fresh["train"].templates)

    # A different geometry must NOT hit the same cache entry (it reaches the
    # patched generator and explodes).
    import pytest

    cfg2 = DataConfig(n_train=24, n_query=8, n_database=41, n_classes=4,
                      image_size=16)
    with pytest.raises(AssertionError, match="cache miss"):
        make_splits(cfg2)
