"""Image dataset loaders: CIFAR-10/100, rotated MNIST, STL-10, ImageNet.

Counterparts of the reference datamodules (examples/images/classification/
prepare/*.py: CIFAR10/100 with rotation/AutoAugment policies, RotatedMNIST
.amat loader, STL10, ImageNet). This environment has no network egress, so
loaders *gate on local files* (cifar-10 python pickles, MNIST .amat, STL-10
binaries under `data_path`) and raise a clear error otherwise; the synthetic
generator (data/synthetic.py) is the hermetic fallback used by tests and
benchmarks.

All loaders return numpy arrays normalized to NHWC float32 with the
reference's per-dataset mean/std, plus a jax.random-driven batch iterator
with the reference's augmentation policies (random crop + flip; discrete
rotation augmentation for the 'rotation' policy).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

__all__ = [
    "load_cifar10",
    "load_cifar100",
    "load_stl10",
    "load_rotated_mnist",
    "imagenet_index",
    "imagenet_batch_iterator",
    "image_batch_iterator",
    "get_image_dataset",
    "rand_augment",
    "DATASET_STATS",
]

DATASET_STATS = {
    # (mean, std) per channel, matching the reference transforms
    "cifar10": ((0.4914, 0.4822, 0.4465), (0.2470, 0.2435, 0.2616)),
    "cifar100": ((0.5071, 0.4865, 0.4409), (0.2673, 0.2564, 0.2762)),
    "stl10": ((0.4467, 0.4398, 0.4066), (0.2603, 0.2566, 0.2713)),
    "rotated_mnist": ((0.1307,), (0.3081,)),
    "imagenet": ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
}


def _normalize(x: np.ndarray, name: str) -> np.ndarray:
    mean, std = DATASET_STATS[name]
    return (x - np.asarray(mean)) / np.asarray(std)


def load_cifar10(data_path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Load the standard cifar-10-batches-py pickles from disk.

    Returns (train, test) dicts of NHWC float32 images + int labels.
    """
    root = os.path.join(data_path, "cifar-10-batches-py")
    if not os.path.isdir(root):
        raise FileNotFoundError(
            f"CIFAR-10 not found at {root}; this environment cannot download "
            "datasets — place the python-version batches there or use "
            "dataset.dataset_name=synthetic"
        )

    def _load(files):
        xs, ys = [], []
        for fname in files:
            with open(os.path.join(root, fname), "rb") as f:
                d = pickle.load(f, encoding="bytes")
            xs.append(d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1))
            ys.append(np.asarray(d[b"labels"]))
        x = np.concatenate(xs).astype(np.float32) / 255.0
        return {"image": _normalize(x, "cifar10").astype(np.float32),
                "label": np.concatenate(ys).astype(np.int32)}

    train = _load([f"data_batch_{i}" for i in range(1, 6)])
    test = _load(["test_batch"])
    return train, test


def load_cifar100(data_path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """cifar-100-python pickles (train/test files, 'fine_labels')."""
    root = os.path.join(data_path, "cifar-100-python")
    if not os.path.isdir(root):
        raise FileNotFoundError(
            f"CIFAR-100 not found at {root}; no network egress — place the "
            "python-version pickles there or use synthetic data"
        )

    def _load(fname):
        with open(os.path.join(root, fname), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        x = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        x = x.astype(np.float32) / 255.0
        return {"image": _normalize(x, "cifar100").astype(np.float32),
                "label": np.asarray(d[b"fine_labels"]).astype(np.int32)}

    return _load("train"), _load("test")


def load_stl10(data_path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """STL-10 binary files (train_X.bin/train_y.bin/test_X.bin/test_y.bin)."""
    root = os.path.join(data_path, "stl10_binary")
    if not os.path.isdir(root):
        raise FileNotFoundError(
            f"STL-10 not found at {root}; no network egress — place the "
            "binary files there or use synthetic data"
        )

    def _load(xf, yf):
        x = np.fromfile(os.path.join(root, xf), np.uint8)
        # column-major 96x96x3 per STL-10 spec
        x = x.reshape(-1, 3, 96, 96).transpose(0, 3, 2, 1).astype(np.float32) / 255.0
        y = np.fromfile(os.path.join(root, yf), np.uint8).astype(np.int32) - 1
        return {"image": _normalize(x, "stl10").astype(np.float32), "label": y}

    return _load("train_X.bin", "train_y.bin"), _load("test_X.bin", "test_y.bin")


def load_rotated_mnist(data_path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Load the .amat rotated-MNIST files (reference
    prepare/rotated_mnist_data.py:11-60)."""
    train_f = os.path.join(
        data_path, "mnist_all_rotation_normalized_float_train_valid.amat"
    )
    test_f = os.path.join(data_path, "mnist_all_rotation_normalized_float_test.amat")
    if not (os.path.isfile(train_f) and os.path.isfile(test_f)):
        raise FileNotFoundError(
            f"rotated MNIST .amat files not found under {data_path}"
        )

    def _load(path):
        raw = np.loadtxt(path, dtype=np.float32)
        x = raw[:, :-1].reshape(-1, 28, 28, 1)
        y = raw[:, -1].astype(np.int32)
        return {"image": _normalize(x, "rotated_mnist").astype(np.float32), "label": y}

    return _load(train_f), _load(test_f)


def imagenet_index(data_path: str, split: str):
    """ImageFolder-style index of `data_path/{split}/<class>/<image>` files.

    The reference builds the same structure with
    torchvision.datasets.ImageFolder (prepare/imagenet_data.py:113-122);
    classes are the sorted directory names, labels their sorted order.
    """
    root = os.path.join(data_path, split)
    if not os.path.isdir(root):
        raise FileNotFoundError(
            f"ImageNet split not found at {root}; this environment cannot "
            "download datasets — place ImageFolder-layout data there "
            "(train/<wnid>/*.JPEG) or use dataset.dataset_name=synthetic"
        )
    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    paths, labels = [], []
    exts = (".jpeg", ".jpg", ".png", ".bmp", ".webp")
    for li, cls in enumerate(classes):
        for fname in sorted(os.listdir(os.path.join(root, cls))):
            if fname.lower().endswith(exts):
                paths.append(os.path.join(root, cls, fname))
                labels.append(li)
    if not paths:
        raise FileNotFoundError(f"no images under {root}")
    return paths, np.asarray(labels, np.int32), classes


def _imagenet_decode_train(path: str, image_size: int, rng: np.random.Generator) -> np.ndarray:
    """RandomResizedCrop(size, bilinear) + ToTensor semantics (reference
    prepare/imagenet_data.py:55-61): random area in [0.08, 1] and aspect in
    [3/4, 4/3] (log-uniform), 10 attempts then center-crop fallback."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        W, H = im.size
        area = W * H
        for _ in range(10):
            target_area = area * rng.uniform(0.08, 1.0)
            aspect = np.exp(rng.uniform(np.log(3.0 / 4.0), np.log(4.0 / 3.0)))
            w = int(round(np.sqrt(target_area * aspect)))
            h = int(round(np.sqrt(target_area / aspect)))
            if 0 < w <= W and 0 < h <= H:
                left = int(rng.integers(0, W - w + 1))
                top = int(rng.integers(0, H - h + 1))
                im = im.resize(
                    (image_size, image_size), Image.BILINEAR,
                    box=(left, top, left + w, top + h),
                )
                break
        else:
            # torchvision's fallback: clamp to the nearest allowed aspect
            # ratio, then center crop (RandomResizedCrop.get_params)
            in_ratio = W / H
            if in_ratio < 3.0 / 4.0:
                w, h = W, int(round(W / (3.0 / 4.0)))
            elif in_ratio > 4.0 / 3.0:
                w, h = int(round(H * (4.0 / 3.0))), H
            else:
                w, h = W, H
            left, top = (W - w) // 2, (H - h) // 2
            im = im.resize(
                (image_size, image_size), Image.BILINEAR,
                box=(left, top, left + w, top + h),
            )
        return np.asarray(im, np.float32) / 255.0


def _imagenet_decode_eval(path: str, image_size: int) -> np.ndarray:
    """Resize(shorter -> 256 * size/224, bilinear) + CenterCrop(size)
    (reference prepare/imagenet_data.py:69-76)."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        W, H = im.size
        short = int(round(256 * image_size / 224))
        if W <= H:
            nw, nh = short, int(round(H * short / W))
        else:
            nw, nh = int(round(W * short / H)), short
        im = im.resize((nw, nh), Image.BILINEAR)
        left, top = (nw - image_size) // 2, (nh - image_size) // 2
        im = im.crop((left, top, left + image_size, top + image_size))
        return np.asarray(im, np.float32) / 255.0


def imagenet_batch_iterator(
    rng: jax.Array,
    data_path: str,
    split: str = "train",
    batch_size: int = 256,
    image_size: int = 224,
    num_batches: Optional[int] = None,
    num_workers: int = 8,
) -> Iterator[Dict[str, Array]]:
    """Streaming ImageNet batches: shuffled (train) ImageFolder traversal,
    per-image RandomResizedCrop+flip (train) / resize+center-crop (val),
    ImageNet normalization — decoded by a thread pool (the DataLoader
    num_workers analog, reference prepare/imagenet_data.py:124-131; PIL
    decode releases the GIL)."""
    from concurrent.futures import ThreadPoolExecutor

    paths, labels, _ = imagenet_index(data_path, split)
    n = len(paths)
    train = split == "train"
    seed = int(jax.random.randint(jax.random.fold_in(rng, 3), (), 0, 2**31 - 1))
    host_rng = np.random.default_rng(seed)
    order = host_rng.permutation(n) if train else np.arange(n)
    total = n // batch_size if train else (n + batch_size - 1) // batch_size
    if num_batches is not None:
        total = min(total, num_batches)

    def _decode(args):
        i, path = args
        if train:
            img_rng = np.random.default_rng(seed ^ (i * 2654435761))
            img = _imagenet_decode_train(path, image_size, img_rng)
            if img_rng.random() < 0.5:  # RandomHorizontalFlip(0.5)
                img = img[:, ::-1, :]
        else:
            img = _imagenet_decode_eval(path, image_size)
        return _normalize(img, "imagenet").astype(np.float32)

    def _submit(pool, b):
        idx = order[b * batch_size : (b + 1) * batch_size]
        fut = pool.map(_decode, [(int(i), paths[i]) for i in idx])
        return fut, idx

    # one-batch lookahead: batch b+1 decodes in the pool while the caller
    # consumes batch b (the DataLoader-prefetch analog)
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        pending = _submit(pool, 0) if total else None
        for b in range(total):
            fut, idx = pending
            nxt = _submit(pool, b + 1) if b + 1 < total else None
            imgs = list(fut)
            pending = nxt
            yield {
                "image": jnp.asarray(np.stack(imgs)),
                "label": jnp.asarray(labels[idx]),
            }


_DATA_CACHE: Dict[tuple, tuple] = {}


def get_image_dataset(
    cfg, rng: jax.Array, num_batches: int, split: str = "train"
) -> Iterator[Dict[str, Array]]:
    """Datamodule registry dispatch (reference train_utils.py:117-130):
    dataset_name -> loader + batch iterator. `split="train"` shuffles and
    augments; `split="test"` serves the held-out split deterministically
    with no augmentation (the val/test dataloaders of the reference's
    datamodules). In-memory datasets are cached per (name, path) across
    epochs; ImageNet streams."""
    name = cfg.dataset.dataset_name
    bs = cfg.experiment.batch_size
    train_split = split == "train"
    if name == "imagenet":
        yield from imagenet_batch_iterator(
            rng, cfg.dataset.data_path, "train" if train_split else "val",
            bs, image_size=cfg.dataset.image_size, num_batches=num_batches,
        )
        return
    loaders = {
        "cifar10": load_cifar10,
        "cifar100": load_cifar100,
        "stl10": load_stl10,
        "rotated_mnist": load_rotated_mnist,
    }
    if name not in loaders:
        raise ValueError(
            f"unknown dataset '{name}' (expected one of "
            f"{sorted(loaders) + ['imagenet', 'synthetic']})"
        )
    key = (name, cfg.dataset.data_path)
    if key not in _DATA_CACHE:
        _DATA_CACHE[key] = loaders[name](cfg.dataset.data_path)
    train, test = _DATA_CACHE[key]
    it = image_batch_iterator(
        rng, train if train_split else test, bs,
        augment=cfg.dataset.augment if train_split else "none",
        num_rotations=cfg.canonicalization.network_hyperparams.num_rotations,
        shuffle=train_split,
        dataset_name=name,
    )
    for i, batch in enumerate(it):
        if i >= num_batches:
            break
        yield batch


def rand_augment(
    rng: jax.Array, images: jnp.ndarray, num_ops: int = 2, magnitude: float = 0.5
) -> jnp.ndarray:
    """RandAugment-style policy (the jit-friendly stand-in for the
    reference's torchvision AutoAugment option, prepare/cifar_data.py):
    per image, apply `num_ops` randomly chosen ops from
    {identity, hflip, rotate, brightness, contrast, solarize} with random
    magnitudes, as one batched `lax.switch`-free blend.
    """
    from equiadapt_tpu.ops.warp import rotate as _rot

    B = images.shape[0]

    def apply_one(rng, x):
        k_op, k_m = jax.random.split(rng)
        op = jax.random.randint(k_op, (B,), 0, 6)
        m = jax.random.uniform(k_m, (B,), minval=-magnitude, maxval=magnitude)
        mb = m[:, None, None, None]
        candidates = jnp.stack(
            [
                x,
                x[:, :, ::-1, :],
                _rot(x, m * 60.0, padding_mode="border"),
                x + mb,  # brightness
                (x - x.mean(axis=(1, 2, 3), keepdims=True)) * (1 + mb)
                + x.mean(axis=(1, 2, 3), keepdims=True),  # contrast
                jnp.where(x > jnp.abs(mb), -x, x),  # solarize
            ],
            axis=0,
        )
        oh = jax.nn.one_hot(op, 6, dtype=x.dtype)
        return jnp.einsum("gbhwc,bg->bhwc", candidates, oh)

    for i in range(num_ops):
        images = apply_one(jax.random.fold_in(rng, i), images)
    return images


def image_batch_iterator(
    rng: jax.Array,
    data: Dict[str, np.ndarray],
    batch_size: int,
    augment: str = "none",
    num_rotations: int = 4,
    shuffle: bool = True,
    dataset_name: Optional[str] = None,
) -> Iterator[Dict[str, Array]]:
    """Epoch iterator with the reference's augmentation policies
    (prepare/cifar_data.py:26-80): 'none', 'flip' (crop+flip),
    'rotation' (+ discrete group rotations), 'autoaugment' (the real
    torchvision CIFAR10 AutoAugment policy when dataset_name gives the
    normalization stats to round-trip through uint8; jit-friendly
    rand_augment otherwise)."""
    n = data["image"].shape[0]
    order = np.asarray(jax.random.permutation(rng, n)) if shuffle else np.arange(n)
    aa_rng = np.random.default_rng(
        int(jax.random.randint(jax.random.fold_in(rng, 7), (), 0, 2**31 - 1))
    )
    for i in range(n // batch_size):
        idx = order[i * batch_size : (i + 1) * batch_size]
        img_np = data["image"][idx]
        lab = jnp.asarray(data["label"][idx])
        if augment == "autoaugment" and dataset_name in DATASET_STATS:
            # AutoAugment operates on uint8 pre-normalization (like the
            # torchvision transform ordering): denormalize, augment,
            # renormalize — host-side, matching the torch CPU data path
            from equiadapt_tpu.data.autoaugment import autoaugment_cifar10

            mean, std = DATASET_STATS[dataset_name]
            raw = np.clip(
                (img_np * np.asarray(std) + np.asarray(mean)) * 255.0, 0, 255
            ).astype(np.uint8)
            raw = autoaugment_cifar10(aa_rng, raw)
            img_np = _normalize(raw.astype(np.float32) / 255.0, dataset_name)
        img = jnp.asarray(img_np)
        if augment in ("flip", "rotation", "autoaugment"):
            k1, k2, rng = jax.random.split(rng, 3)
            flip = jax.random.bernoulli(k1, 0.5, (batch_size,))
            img = jnp.where(flip[:, None, None, None], img[:, :, ::-1, :], img)
            if augment == "rotation":
                from equiadapt_tpu.ops.warp import group_angles, rotate

                ang = jax.random.choice(k2, group_angles(num_rotations), (batch_size,))
                img = rotate(img, ang, padding_mode="border")
            elif augment == "autoaugment" and dataset_name not in DATASET_STATS:
                img = rand_augment(k2, img)
        yield {"image": img, "label": lab}
