"""On-disk format parsing tests for the image datamodules.

This environment has no network egress, so the real datasets are never
present — but the *parse paths* (CIFAR python pickles, STL-10 column-major
binaries, rotated-MNIST .amat) can still be exercised against tiny
format-correct fixture files written to tmp_path. Formats follow the
reference's prepare/ loaders (cifar_data.py, rotated_mnist_data.py) and the
upstream dataset specs.
"""

import os
import pickle

import numpy as np
import pytest

from equiadapt_tpu.data.images import (
    DATASET_STATS,
    load_cifar10,
    load_cifar100,
    load_rotated_mnist,
    load_stl10,
)


def _denorm(x, name):
    mean, std = DATASET_STATS[name]
    return x * np.asarray(std) + np.asarray(mean)


def test_cifar10_pickle_format(tmp_path):
    root = tmp_path / "cifar-10-batches-py"
    root.mkdir()
    rng = np.random.default_rng(0)
    n = 4
    raw = {}
    for fname in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
        data = rng.integers(0, 256, size=(n, 3 * 32 * 32), dtype=np.int64).astype(
            np.uint8
        )
        labels = list(rng.integers(0, 10, size=n))
        raw[fname] = (data, labels)
        with open(root / fname, "wb") as f:
            pickle.dump({b"data": data, b"labels": labels}, f)

    train, test = load_cifar10(str(tmp_path))
    assert train["image"].shape == (5 * n, 32, 32, 3)
    assert test["image"].shape == (n, 32, 32, 3)
    assert train["label"].dtype == np.int32
    # first train image round-trips: NCHW bytes -> HWC floats, normalized
    d0 = raw["data_batch_1"][0][0].reshape(3, 32, 32).transpose(1, 2, 0) / 255.0
    np.testing.assert_allclose(
        _denorm(train["image"][0], "cifar10"), d0, atol=1e-5
    )
    assert train["label"][0] == raw["data_batch_1"][1][0]


def test_cifar100_pickle_format(tmp_path):
    root = tmp_path / "cifar-100-python"
    root.mkdir()
    rng = np.random.default_rng(1)
    n = 3
    for fname in ["train", "test"]:
        data = rng.integers(0, 256, size=(n, 3 * 32 * 32), dtype=np.int64).astype(
            np.uint8
        )
        with open(root / fname, "wb") as f:
            pickle.dump(
                {b"data": data, b"fine_labels": list(rng.integers(0, 100, size=n))},
                f,
            )
    train, test = load_cifar100(str(tmp_path))
    assert train["image"].shape == (n, 32, 32, 3)
    assert test["label"].shape == (n,)


def test_stl10_binary_format_column_major(tmp_path):
    """STL-10 spec: uint8, per image 3x96x96 stored column-major — the
    loader must transpose (0,3,2,1) so a pixel written at (row r, col c,
    channel ch) lands at image[r, c, ch]."""
    root = tmp_path / "stl10_binary"
    root.mkdir()
    n = 2
    x = np.zeros((n, 3, 96, 96), np.uint8)  # [img, ch, col, row] per spec
    x[0, 2, 5, 7] = 255  # channel 2, column 5, row 7
    y = np.asarray([1, 10], np.uint8)  # STL labels are 1-based
    for split in ["train", "test"]:
        x.tofile(root / f"{split}_X.bin")
        y.tofile(root / f"{split}_y.bin")
    train, _ = load_stl10(str(tmp_path))
    assert train["image"].shape == (n, 96, 96, 3)
    img0 = _denorm(train["image"][0], "stl10")
    assert img0[7, 5, 2] == pytest.approx(1.0, abs=1e-5)
    assert img0.sum() == pytest.approx(1.0, abs=1e-3)
    np.testing.assert_array_equal(train["label"], [0, 9])  # 0-based


def test_rotated_mnist_amat_format(tmp_path):
    """.amat rows: 784 floats in [0,1] then the label (reference
    prepare/rotated_mnist_data.py)."""
    rng = np.random.default_rng(2)
    n = 3
    for fname in [
        "mnist_all_rotation_normalized_float_train_valid.amat",
        "mnist_all_rotation_normalized_float_test.amat",
    ]:
        rows = np.concatenate(
            [rng.uniform(0, 1, size=(n, 784)), rng.integers(0, 10, (n, 1))],
            axis=1,
        )
        np.savetxt(tmp_path / fname, rows, fmt="%.6f")
    train, test = load_rotated_mnist(str(tmp_path))
    assert train["image"].shape == (n, 28, 28, 1)
    assert set(np.unique(test["label"])).issubset(set(range(10)))


def test_missing_dataset_raises_actionable_error(tmp_path):
    with pytest.raises(FileNotFoundError, match="synthetic"):
        load_cifar10(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        load_rotated_mnist(str(tmp_path))


def test_dataset_stats_match_reference_transforms():
    # the reference's normalization constants (prepare/cifar_data.py etc.)
    assert DATASET_STATS["cifar10"][0] == (0.4914, 0.4822, 0.4465)
    assert DATASET_STATS["rotated_mnist"] == ((0.1307,), (0.3081,))


