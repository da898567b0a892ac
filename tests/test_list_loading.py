"""End-to-end list-file dataset loading (SURVEY.md C15 disk path)."""

import numpy as np
import pytest


@pytest.fixture
def image_dataset(tmp_path):
    from PIL import Image

    from hashgan_tpu.data.lists import write_list_file

    rng = np.random.default_rng(0)
    paths, labels = [], []
    for i in range(12):
        arr = rng.integers(0, 255, (40, 48, 3), dtype=np.uint8)  # non-square
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
        labels.append(np.eye(3)[i % 3])
    labels = np.asarray(labels, dtype=np.float32)
    for split in ("train", "test", "database"):
        write_list_file(str(tmp_path / f"{split}.txt"), paths, labels)
    return tmp_path, labels


def test_load_list_dataset_resizes_and_labels(image_dataset):
    from hashgan_tpu.configs import DataConfig
    from hashgan_tpu.data.loader import load_list_dataset

    tmp_path, labels = image_dataset
    cfg = DataConfig(image_size=32, channels=3)
    ds = load_list_dataset(str(tmp_path / "train.txt"), cfg)
    assert ds.images.shape == (12, 32, 32, 3)
    assert ds.images.dtype == np.uint8
    np.testing.assert_array_equal(ds.labels, labels)


def test_make_splits_prefers_list_files(image_dataset):
    from hashgan_tpu.configs import DataConfig
    from hashgan_tpu.data import make_splits

    tmp_path, labels = image_dataset
    cfg = DataConfig(
        image_size=32,
        train_list=str(tmp_path / "train.txt"),
        test_list=str(tmp_path / "test.txt"),
        database_list=str(tmp_path / "database.txt"),
    )
    splits = make_splits(cfg)
    assert len(splits["train"]) == 12
    assert splits["query"].images.shape == (12, 32, 32, 3)


def test_make_splits_configured_but_missing_lists_raise(tmp_path):
    """A configured-but-absent list must ERROR, not silently fall back to
    synthetic data (round-1 advisor finding: half-loading opaquely mixes
    synthetic splits into a real-data run)."""
    import pytest

    from hashgan_tpu.configs import DataConfig
    from hashgan_tpu.data import make_splits

    cfg = DataConfig(
        n_train=16, n_query=4, n_database=8,
        train_list=str(tmp_path / "nope.txt"),
    )
    with pytest.raises(FileNotFoundError):
        make_splits(cfg)


def test_make_splits_unconfigured_lists_use_synthetic():
    from hashgan_tpu.configs import DataConfig
    from hashgan_tpu.data import make_splits

    cfg = DataConfig(n_train=16, n_query=4, n_database=8)
    splits = make_splits(cfg)
    assert len(splits["train"]) == 16  # synthetic (nothing configured)
