"""Exact-mode pallas bilinear warp (ops/pallas/bilinear_warp.py).

The kernel must reproduce `_warp_center_affine` — the XLA taps-form direct
4-tap bilinear warp that carries torch/kornia parity (reference
continuous_group.py:191-208) — to fp32-matmul tolerance, for every padding
mode, channel count, tiling regime (windowed / full-width lanes, sliced /
full-height band, power-of-two and odd tile factors).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from equiadapt_tpu.images.canonicalization.continuous_group import (
    _warp_center_affine,
)
from equiadapt_tpu.ops.pallas.bilinear_warp import (
    exact_warp_tiling,
    warp_rotate_center_exact,
)


def _rotations(angles):
    th = np.asarray(angles, np.float32)
    return jnp.asarray(
        np.stack(
            [
                np.stack([np.cos(th), -np.sin(th)], -1),
                np.stack([np.sin(th), np.cos(th)], -1),
            ],
            -2,
        )
    )


# shapes cover: full-height band (28, 32), sliced band (64+), lane window
# active (160 C=1: WIN 128 < 160), window inactive (64*3 < WIN), odd tile
# factor TW=14 (28px), non-square
@pytest.mark.parametrize(
    "H,W,C",
    [(32, 32, 1), (28, 28, 3), (64, 64, 3), (160, 160, 1), (32, 64, 2)],
)
@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
def test_matches_xla_taps_form(H, W, C, padding_mode):
    rng = np.random.default_rng(0)
    xg = rng.normal(size=(5, H, W, C)).astype(np.float32)
    # arbitrary angles + exact quarter-turns (tap weights degenerate to 0/1)
    R = _rotations([0.0, np.pi / 2, np.pi, 0.7, 2.5])
    # image-range data at the parity budget; unit-Gaussian data a touch
    # looser (summation-order fp32 rounding scales with operand magnitude)
    for x, atol in ((jnp.asarray(1 / (1 + np.exp(-xg))), 1e-5),
                    (jnp.asarray(xg), 5e-5)):
        ref = _warp_center_affine(x, R, padding_mode)
        got = warp_rotate_center_exact(x, R, padding_mode, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=atol
        )


def test_bf16_input_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 32, 32, 3)).astype(np.float32))
    R = _rotations([0.3, 1.9, 4.0])
    ref = _warp_center_affine(x.astype(jnp.bfloat16), R, "border")
    got = warp_rotate_center_exact(
        x.astype(jnp.bfloat16), R, "border", interpret=True
    )
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.02, atol=0.02,
    )


def test_rotoreflection_factored_matrix():
    # the canonicalizer applies reflections as a separate hflip; the warp
    # only ever sees pure rotations — but the inverse-coefficient algebra
    # must also hold for det=-1 orthogonal matrices (defensive)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    th = np.asarray([0.4, 2.2], np.float32)
    R = np.stack(
        [
            np.stack([np.cos(th), np.sin(th)], -1),
            np.stack([np.sin(th), -np.cos(th)], -1),
        ],
        -2,
    ).astype(np.float32)
    R = jnp.asarray(R)
    ref = _warp_center_affine(x, R, "border")
    got = warp_rotate_center_exact(x, R, "border", interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_tiling_degenerate_shapes():
    assert exact_warp_tiling(1, 64) is None
    assert exact_warp_tiling(64, 1) is None
    assert exact_warp_tiling(224, 224) is not None
    rb, tw, band = exact_warp_tiling(224, 224)
    assert 224 % rb == 0 and 224 % tw == 0
    assert band >= tw + rb + 2


def test_dispatch_xla_fallback_off_tpu():
    # off-TPU the dispatch must route to the XLA warp regardless of the
    # exact_warp option; same numerics either way
    from equiadapt_tpu.images.canonicalization.continuous_group import (
        _exact_warp,
    )
    from equiadapt_tpu.kernel_options import kernel_options

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    R = _rotations([0.5, 1.0])
    ref = _warp_center_affine(x, R, "border")
    with kernel_options(exact_warp="pallas"):
        got = _exact_warp(x, R, "border", training=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    with kernel_options(exact_warp="xla"):
        got = _exact_warp(x, R, "border", training=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused_canonicalize_graph_through_interpret_kernel():
    """Drive the FULL steerable exact-mode canonicalize (energy net ->
    angle -> warp) through the pallas kernel in interpret mode and compare
    against the XLA-warp graph — the round-4 lesson: standalone-op checks
    pass while the fused energy+warp graph fails, so the fused graph needs
    kernel-path coverage on CPU too (exact_warp="interpret")."""
    from equiadapt_tpu.images.canonicalization.continuous_group import (
        SteerableImageCanonicalization,
    )
    from equiadapt_tpu.images.networks.steerable import SteerableNetwork
    from equiadapt_tpu.kernel_options import kernel_options

    rng = np.random.default_rng(7)
    net = SteerableNetwork(
        in_channels=3, out_channels=4, kernel_size=3, num_layers=1
    )
    canon = SteerableImageCanonicalization(
        canonicalization_network=net, in_shape=(32, 32, 3),
        input_crop_ratio=0.9, resize_shape=16, warp_mode="exact",
    )
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    params = canon.init(jax.random.key(0), x, training=False)

    with kernel_options(exact_warp="xla"):
        ref, info_ref = jax.jit(
            lambda p, a: canon.apply(p, a, training=False)
        )(params, x)
    with kernel_options(exact_warp="interpret"):
        got, info_got = jax.jit(
            lambda p, a: canon.apply(p, a, training=False)
        )(params, x)
    # identical angle selection, warp within kernel parity tolerance
    np.testing.assert_array_equal(
        np.asarray(info_got.element.rotation), np.asarray(info_ref.element.rotation)
    )
    d = float(jnp.max(jnp.abs(got - ref)))
    assert d < 2e-6, d


def test_nan_rotation_produces_nan_pixels_not_wild_addresses():
    """A degenerate (zero-vector -> NaN) rotation matrix must produce NaN
    OUTPUTS, never undefined slice addresses: int32(NaN) fed to the band
    DMA start hung the TPU worker in round 5 (bench inits the steerable
    canonicalizer on an all-zeros batch, whose predicted vector normalizes
    to NaN). The kernel fences the address math (corners isfinite guard)
    while leaving tap weights NaN — matching the XLA gather path's
    NaN-in/NaN-out."""
    from equiadapt_tpu.common.math import rotmat_2d_from_vector

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    R_nan = rotmat_2d_from_vector(jnp.zeros((1, 2)))
    R_ok = _rotations([0.3])
    R = jnp.concatenate([R_nan, R_ok])
    out = warp_rotate_center_exact(x, R, "border", interpret=True)
    assert bool(jnp.isnan(out[0]).all()), "degenerate sample must be all-NaN"
    ref = _warp_center_affine(x[1:], R_ok, "border")
    np.testing.assert_allclose(
        np.asarray(out[1]), np.asarray(ref[0]), rtol=1e-4, atol=1e-5
    )
