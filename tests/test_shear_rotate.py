"""Continuous fast-warp path: 3-shear pallas kernel (interpret mode) +
rot90-about-center composition + canonicalizer wiring.

Contracts:
* quarter turns match the exact warp to fp rounding (the residual angle
  after the atan2/round decomposition is ~1e-7, not exactly 0);
* [-45, 45]-degree residuals stay close to exact 4-tap bilinear on smooth
  images (same tolerance class as rotate_twopass);
* "zeros" padding matches in the valid interior;
* the continuous canonicalizer in warp_mode="fast" tracks the exact path.

On-TPU bit-equality of compiled vs interpret kernel is asserted by the
perf harness (docs/benchmarking.md); CI runs interpret mode only.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equiadapt_tpu.images.canonicalization.continuous_group import (
    SteerableImageCanonicalization,
    _warp_center_affine,
)
from equiadapt_tpu.ops.pallas.shear_rotate import (
    _rot90_centered,
    shear_rotate_residual,
    warp_rotate_center_fast,
)


def _rmat(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)


def _smooth(key, b, size, c=3):
    coarse = jax.random.uniform(key, (b, size // 8, size // 8, c))
    return jax.image.resize(coarse, (b, size, size, c), method="cubic")


def _disk(size, margin=2):
    c = (size - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(size), jnp.arange(size), indexing="ij")
    return (((yy - c) ** 2 + (xx - c) ** 2) <= (size / 2 - margin) ** 2)[
        None, :, :, None
    ]


@pytest.mark.parametrize("k", [0, 1, 2, 3])
def test_quarter_turns_match_exact_warp(k):
    x = jax.random.normal(jax.random.key(0), (3, 16, 16, 2))
    th = jnp.full((3,), k * jnp.pi / 2)
    exact = _warp_center_affine(x, _rmat(th), "border")
    fast = warp_rotate_center_fast(x, _rmat(th), "border", interpret=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=1e-5, rtol=1e-5)


def test_rot90_centered_matches_explicit_gather():
    S, c = 8, 4
    x = np.random.default_rng(0).uniform(size=(1, S, S, 1)).astype(np.float32)
    M1 = np.array([[0, -1], [1, 0]])
    for j in range(4):
        M = np.linalg.matrix_power(M1, j)
        gt = np.zeros_like(x)
        for py in range(S):
            for px in range(S):
                q = M @ np.array([px - c, py - c]) + c
                gt[0, py, px, 0] = x[
                    0, int(np.clip(q[1], 0, S - 1)), int(np.clip(q[0], 0, S - 1)), 0
                ]
        out = _rot90_centered(jnp.asarray(x), j, c, c, "border")
        np.testing.assert_array_equal(np.asarray(out), gt)


@pytest.mark.parametrize("deg", [30.0, 45.0, -60.0, 123.4, 200.0])
def test_residual_close_to_exact_on_smooth_images(deg):
    x = _smooth(jax.random.key(1), 2, 64)
    th = jnp.full((2,), np.deg2rad(deg), jnp.float32)
    exact = _warp_center_affine(x, _rmat(th), "border")
    fast = warp_rotate_center_fast(x, _rmat(th), "border", interpret=True)
    err = jnp.abs(exact - fast) * _disk(64)
    assert float(err.max()) < 0.15, float(err.max())
    assert float(jnp.sqrt(jnp.mean(err**2))) < 0.01


def test_zeros_padding_interior_close():
    x = _smooth(jax.random.key(2), 2, 64)
    th = jnp.full((2,), np.deg2rad(33.0), jnp.float32)
    exact = _warp_center_affine(x, _rmat(th), "zeros")
    fast = warp_rotate_center_fast(x, _rmat(th), "zeros", interpret=True)
    err = jnp.abs(exact - fast)[:, 20:-20, 20:-20, :]
    assert float(err.max()) < 0.1, float(err.max())


def test_per_sample_angles_kernel():
    x = _smooth(jax.random.key(3), 6, 32)
    r = jnp.asarray([-0.7, -0.3, 0.0, 0.2, 0.5, 0.78], jnp.float32)
    out = shear_rotate_residual(x, r, 16.0, 16.0, "border", interpret=True)
    # r = 0 must be the identity, bit-exact
    assert (out[2] == x[2]).all()
    # others: each sample independently close to the exact warp
    exact = _warp_center_affine(x, _rmat(-r), "border")  # sampling rot = Rot(r)
    err = (jnp.abs(exact - out) * _disk(32)).max(axis=(1, 2, 3))
    assert float(err.max()) < 0.2, err


class _MeanVectorNet(nn.Module):
    """Deterministic stand-in for the steerable network: one 2-vector per
    sample from spatial means (mocked-network fixture pattern, reference
    tests/images/canonicalization/test_continuous_group.py:104-121)."""

    @nn.compact
    def __call__(self, x, training=False):
        m = jnp.mean(x, axis=(1, 2))  # (B, C)
        v = jnp.stack([m[:, 0] - m[:, 1] + 0.3, m[:, 1] + 0.1], axis=-1)
        return v[:, None, :]  # (B, 1, 2)


def test_continuous_canonicalizer_fast_tracks_exact():
    kw = dict(
        canonicalization_network=_MeanVectorNet(), in_shape=(32, 32, 3),
        group_type="rotation",
    )
    fast = SteerableImageCanonicalization(warp_mode="fast", **kw)
    exact = SteerableImageCanonicalization(**kw)
    x = _smooth(jax.random.key(4), 4, 32)
    params = exact.init(jax.random.key(5), x, training=False)
    xc_f, info_f = fast.apply(params, x, training=False)
    xc_e, info_e = exact.apply(params, x, training=False)
    np.testing.assert_allclose(
        np.asarray(info_f.matrix_rep), np.asarray(info_e.matrix_rep), atol=1e-6
    )
    err = (jnp.abs(xc_f - xc_e) * _disk(32)).max()
    assert float(err) < 0.2, float(err)
    # scalar invert round-trip consistency between modes
    y_f = fast.apply(
        params, info_f, xc_f, induced_rep_type="scalar",
        method="invert_canonicalization",
    )
    y_e = exact.apply(
        params, info_e, xc_e, induced_rep_type="scalar",
        method="invert_canonicalization",
    )
    err2 = (jnp.abs(y_f - y_e) * _disk(32)).max()
    assert float(err2) < 0.3, float(err2)


@pytest.mark.parametrize("padding", ["border", "zeros"])
@pytest.mark.parametrize("size", [16, 15])
def test_pallas_centered_select_matches_blend(padding, size):
    """Steered centered-quarter-turn kernel == the 4-candidate
    _rot90_centered blend, both centers conventions (even/odd sizes)."""
    import numpy as np

    from equiadapt_tpu.ops.pallas.shear_rotate import (
        _rot90_centered,
        pallas_rot90_centered_select,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, size, size, 3)).astype(np.float32))
    k = jnp.arange(8) % 4
    sel = pallas_rot90_centered_select(
        x, k, size // 2, size // 2, padding, interpret=True
    )
    for b in range(8):
        ref = _rot90_centered(
            x[b : b + 1], int(k[b]), size // 2, size // 2, padding
        )
        np.testing.assert_array_equal(np.asarray(sel[b]), np.asarray(ref[0]))
