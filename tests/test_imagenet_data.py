"""ImageNet datamodule + get_image_dataset registry dispatch.

The reference's ImageNet path is torchvision ImageFolder + RandomResizedCrop
(prepare/imagenet_data.py); here a fake ImageFolder tree of tiny JPEGs
exercises indexing, train/val decode geometry, normalization, streaming
batches, and the train.py dispatcher that previously had no implementation.
"""

import os

import jax
import numpy as np
import pytest
from PIL import Image

from equiadapt_tpu.data.images import (
    DATASET_STATS,
    get_image_dataset,
    imagenet_batch_iterator,
    imagenet_index,
)


@pytest.fixture()
def fake_imagenet(tmp_path):
    rng = np.random.default_rng(0)
    for split, per_class in (("train", 6), ("val", 3)):
        for cls in ("n01440764", "n01443537", "n01484850"):
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            for i in range(per_class):
                arr = rng.integers(0, 255, (40 + 8 * i, 52, 3), np.uint8)
                Image.fromarray(arr).save(d / f"img_{i}.JPEG")
    return str(tmp_path)


def test_imagenet_index_sorted_classes(fake_imagenet):
    paths, labels, classes = imagenet_index(fake_imagenet, "train")
    assert classes == ["n01440764", "n01443537", "n01484850"]
    assert len(paths) == 18 and labels.shape == (18,)
    assert labels.min() == 0 and labels.max() == 2
    # labels follow sorted class order
    assert all(classes[labels[i]] in paths[i] for i in range(len(paths)))


def test_imagenet_index_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="ImageNet split not found"):
        imagenet_index(str(tmp_path), "train")


def test_imagenet_train_batches_shape_and_normalization(fake_imagenet):
    batches = list(
        imagenet_batch_iterator(
            jax.random.key(0), fake_imagenet, "train", batch_size=4,
            image_size=32, num_batches=2, num_workers=2,
        )
    )
    assert len(batches) == 2
    img = np.asarray(batches[0]["image"])
    assert img.shape == (4, 32, 32, 3) and img.dtype == np.float32
    assert batches[0]["label"].shape == (4,)
    # normalized: values centered roughly per ImageNet stats, not [0, 1]
    mean, std = DATASET_STATS["imagenet"]
    lo = (0.0 - max(mean)) / max(std)
    assert img.min() >= lo - 1e-5


def test_imagenet_val_batches_deterministic(fake_imagenet):
    a = list(imagenet_batch_iterator(jax.random.key(1), fake_imagenet, "val",
                                     batch_size=3, image_size=24, num_workers=2))
    b = list(imagenet_batch_iterator(jax.random.key(2), fake_imagenet, "val",
                                     batch_size=3, image_size=24, num_workers=2))
    assert len(a) == 3  # 9 val images, no drop_last for val
    np.testing.assert_array_equal(np.asarray(a[0]["image"]),
                                  np.asarray(b[0]["image"]))
    np.testing.assert_array_equal(np.asarray(a[0]["label"]),
                                  np.asarray(b[0]["label"]))


def test_get_image_dataset_dispatches_imagenet(fake_imagenet):
    from equiadapt_tpu.utils import Config

    cfg = Config().override(
        "dataset.dataset_name=imagenet",
        f"dataset.data_path={fake_imagenet}",
        "dataset.image_size=32",
        "experiment.batch_size=4",
    )
    batches = list(get_image_dataset(cfg, jax.random.key(0), 2))
    assert len(batches) == 2
    assert batches[0]["image"].shape == (4, 32, 32, 3)


def test_get_image_dataset_dispatches_cifar10(tmp_path):
    """Fabricated cifar-10-batches-py pickles flow through the cached
    loader + augmented iterator."""
    import pickle

    from equiadapt_tpu.utils import Config

    root = tmp_path / "cifar-10-batches-py"
    root.mkdir()
    rng = np.random.default_rng(1)
    for fname, n in [(f"data_batch_{i}", 20) for i in range(1, 6)] + [
        ("test_batch", 20)
    ]:
        with open(root / fname, "wb") as f:
            pickle.dump(
                {
                    b"data": rng.integers(0, 255, (n, 3072), np.uint8),
                    b"labels": rng.integers(0, 10, n).tolist(),
                },
                f,
            )
    cfg = Config().override(
        "dataset.dataset_name=cifar10",
        f"dataset.data_path={tmp_path}",
        "experiment.batch_size=8",
        "dataset.augment=flip",
    )
    batches = list(get_image_dataset(cfg, jax.random.key(0), 3))
    assert len(batches) == 3
    assert batches[0]["image"].shape == (8, 32, 32, 3)


def test_get_image_dataset_unknown_name():
    from equiadapt_tpu.utils import Config

    cfg = Config().override("dataset.dataset_name=nope")
    with pytest.raises(ValueError, match="unknown dataset"):
        next(get_image_dataset(cfg, jax.random.key(0), 1))


def test_get_image_dataset_test_split_is_heldout_and_unaugmented(tmp_path):
    """Regression (round-3 review): val/test batches must come from the
    held-out split with no augmentation — previously every evaluation ran
    on shuffled, augmented training images."""
    import pickle

    from equiadapt_tpu.utils import Config

    root = tmp_path / "cifar-10-batches-py"
    root.mkdir()
    rng = np.random.default_rng(5)
    for fname, base in [(f"data_batch_{i}", 0) for i in range(1, 6)] + [
        ("test_batch", 200)
    ]:
        with open(root / fname, "wb") as f:
            pickle.dump(
                {
                    b"data": np.full((16, 3072), base, np.uint8)
                    + rng.integers(0, 40, (16, 3072)).astype(np.uint8),
                    b"labels": rng.integers(0, 10, 16).tolist(),
                },
                f,
            )
    cfg = Config().override(
        "dataset.dataset_name=cifar10",
        f"dataset.data_path={tmp_path}",
        "experiment.batch_size=8",
        "dataset.augment=flip",
    )
    train_b = next(get_image_dataset(cfg, jax.random.key(0), 1, split="train"))
    test_b = next(get_image_dataset(cfg, jax.random.key(0), 1, split="test"))
    # the fabricated test split has a +200 intensity offset -> disjoint
    assert float(test_b["image"].mean()) > float(train_b["image"].mean()) + 1.0
    # deterministic, unaugmented: same rng twice -> identical batches
    test_b2 = next(get_image_dataset(cfg, jax.random.key(7), 1, split="test"))
    np.testing.assert_array_equal(np.asarray(test_b["image"]),
                                  np.asarray(test_b2["image"]))


def test_imagenet_test_split_uses_val_decode(fake_imagenet):
    """split='test' dispatches to the val directory + center-crop decode."""
    from equiadapt_tpu.utils import Config

    cfg = Config().override(
        "dataset.dataset_name=imagenet",
        f"dataset.data_path={fake_imagenet}",
        "dataset.image_size=24",
        "experiment.batch_size=3",
    )
    a = list(get_image_dataset(cfg, jax.random.key(0), 10, split="test"))
    assert len(a) == 3  # 9 val images / batch 3
    b = list(get_image_dataset(cfg, jax.random.key(5), 10, split="test"))
    np.testing.assert_array_equal(np.asarray(a[0]["image"]),
                                  np.asarray(b[0]["image"]))
