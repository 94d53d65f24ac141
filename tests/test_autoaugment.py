"""AutoAugment CIFAR10 policy: PIL-exact photometric ops (fixtures) +
policy/iterator behavior."""

import numpy as np
import pytest

from equiadapt_tpu.data.autoaugment import (
    CIFAR10_POLICY,
    _autocontrast,
    _blend,
    _contrast,
    _equalize,
    _invert,
    _posterize,
    _rotate,
    _sharpness,
    _solarize,
    _translate_x,
    autoaugment_cifar10,
)


def test_policy_table_shape():
    assert len(CIFAR10_POLICY) == 25
    for sub in CIFAR10_POLICY:
        assert len(sub) == 2
        for op, p, m in sub:
            assert 0.0 <= p <= 1.0
            assert m is None or 0 <= m <= 9


def test_posterize_bits():
    img = np.arange(256, dtype=np.uint8).reshape(16, 16, 1)
    out = _posterize(img, 4)
    # keep top 4 bits
    assert (out == (img & 0xF0)).all()


def test_solarize_threshold():
    img = np.asarray([[[10], [200]]], np.uint8)
    out = _solarize(img, 128.0)
    assert out[0, 0, 0] == 10 and out[0, 1, 0] == 55


def test_invert():
    img = np.asarray([[[0], [255], [100]]], np.uint8)
    assert (_invert(img) == np.asarray([[[255], [0], [155]]])).all()


def test_autocontrast_full_range_remap():
    img = np.asarray([[[50], [100]], [[150], [200]]], np.uint8)
    out = _autocontrast(img)
    assert out.min() == 0 and out.max() == 255
    # linear remap: (100-50) * 255/150 = 85
    assert out[0, 1, 0] == 85


def test_equalize_matches_pil_formula():
    """Hand-computed PIL equalize on a tiny histogram."""
    # 16 pixels: 8x value 10, 8x value 200
    img = np.asarray([10] * 8 + [200] * 8, np.uint8).reshape(4, 4, 1)
    h = np.bincount(img.reshape(-1), minlength=256)
    nonzero = h[h > 0]
    step = (int(nonzero.sum()) - int(nonzero[-1])) // 255  # (16-8)//255 == 0
    assert step == 0  # PIL: identity when step == 0
    assert (_equalize(img) == img).all()

    # bigger image where step > 0
    rng = np.random.default_rng(0)
    img2 = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    out2 = _equalize(img2)
    # equalization flattens the cumulative distribution: output histogram
    # spread approximates uniform -> extremes get used
    assert out2.min() < 10 and out2.max() > 245


def test_blend_is_pil_formula():
    a = np.full((2, 2, 1), 100, np.uint8)
    b = np.full((2, 2, 1), 200, np.uint8)
    assert (_blend(a, b, 0.5) == 150).all()
    assert (_blend(a, b, 0.0) == 100).all()
    assert (_blend(a, b, 1.0) == 200).all()
    # clipping beyond the endpoints (PIL enhance factors can exceed 1)
    assert (_blend(a, b, 2.0) == 255).all()


def test_contrast_degenerate_is_mean_luma():
    img = np.stack([np.full((4, 4), 100, np.uint8),
                    np.full((4, 4), 50, np.uint8),
                    np.full((4, 4), 200, np.uint8)], axis=-1)
    out = _contrast(img, -1.0)  # factor 0 -> all pixels = mean luma
    lum = int(np.floor(100 * 299 / 1000 + 50 * 587 / 1000 + 200 * 114 / 1000) + 0.5)
    assert (out == lum).all()


def test_sharpness_preserves_border():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    out = _sharpness(img, -0.9)
    # PIL's SMOOTH filter leaves the 1-pixel border unchanged
    assert (out[0] == img[0]).all() and (out[-1] == img[-1]).all()
    assert (out[:, 0] == img[:, 0]).all() and (out[:, -1] == img[:, -1]).all()
    assert not (out[1:-1, 1:-1] == img[1:-1, 1:-1]).all()


def test_geometric_ops_move_content():
    img = np.zeros((9, 9, 1), np.uint8)
    img[4, 4] = 255
    t = _translate_x(img, 2.0)
    assert t[4, 6, 0] == 255 and t[4, 4, 0] == 0
    r = _rotate(img, 90.0)
    assert r[4, 4, 0] == 255  # center fixed under rotation
    img2 = np.zeros((9, 9, 1), np.uint8)
    img2[4, 7] = 255
    r2 = _rotate(img2, 90.0)
    assert r2.sum() == 255  # moved somewhere, zero-filled elsewhere


def test_batch_application_deterministic_and_uint8():
    rng = np.random.default_rng(42)
    imgs = rng.integers(0, 256, (16, 32, 32, 3)).astype(np.uint8)
    out1 = autoaugment_cifar10(np.random.default_rng(7), imgs)
    out2 = autoaugment_cifar10(np.random.default_rng(7), imgs)
    assert out1.dtype == np.uint8 and out1.shape == imgs.shape
    assert (out1 == out2).all()  # deterministic given the generator seed
    assert not (out1 == imgs).all()  # something changed


def test_iterator_autoaugment_path():
    import jax

    from equiadapt_tpu.data.images import image_batch_iterator

    rng_img = np.random.default_rng(3)
    data = {
        "image": rng_img.normal(size=(32, 32, 32, 3)).astype(np.float32) * 0.2,
        "label": rng_img.integers(0, 10, 32).astype(np.int32),
    }
    it = image_batch_iterator(
        jax.random.key(0), data, batch_size=8, augment="autoaugment",
        dataset_name="cifar10",
    )
    b = next(it)
    assert b["image"].shape == (8, 32, 32, 3)
    assert np.isfinite(np.asarray(b["image"])).all()
