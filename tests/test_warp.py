"""Warp-op tests: exactness at 90-degree multiples, torch grid_sample parity,
and the edge-pad/crop <-> border-sampling equivalence that replaces the
reference's pad->rotate->crop chain (discrete_group.py:207-215)."""

import jax.numpy as jnp
import numpy as np
import pytest

from equiadapt_tpu.ops import (
    affine_grid_sample,
    bilinear_sample,
    center_crop,
    hflip,
    rotate,
    warp_affine,
)


def _img(b=2, h=16, w=16, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))


def test_rotate_zero_is_identity():
    x = _img()
    np.testing.assert_allclose(np.asarray(rotate(x, 0.0)), np.asarray(x), atol=1e-6)


@pytest.mark.parametrize("k", [1, 2, 3])
def test_rotate_90_multiples_exact(k):
    x = _img(h=17, w=17)  # odd size: integer center
    out = rotate(x, 90.0 * k, padding_mode="zeros")
    expect = np.rot90(np.asarray(x), k=k, axes=(1, 2))
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


@pytest.mark.parametrize("k", [1, 2, 3])
def test_rotate_90_multiples_exact_even_size(k):
    # even sizes also land on integer coords under the (W-1)/2 center
    x = _img(h=16, w=16)
    out = rotate(x, 90.0 * k, padding_mode="zeros")
    expect = np.rot90(np.asarray(x), k=k, axes=(1, 2))
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_rotate_round_trip_interior():
    # smooth image: bilinear round-trip error is interpolation-order-bounded
    yy, xx = np.meshgrid(np.linspace(0, 1, 32), np.linspace(0, 1, 32), indexing="ij")
    smooth = np.stack([np.sin(3 * xx + 2 * yy), np.cos(2 * xx - yy)], axis=-1)
    x = jnp.asarray(smooth[None].astype(np.float32))
    back = rotate(rotate(x, 33.0, padding_mode="border"), -33.0, padding_mode="border")
    a = np.asarray(back)[:, 10:22, 10:22]
    b = np.asarray(x)[:, 10:22, 10:22]
    np.testing.assert_allclose(a, b, atol=0.02)


def test_border_mode_equals_pad_rotate_crop():
    """rotate(border) == materialized edge-pad -> rotate(zeros) -> center-crop."""
    x = _img(h=20, w=20)
    angle = 37.0
    ours = rotate(x, angle, padding_mode="border")

    pad = 10  # ceil(0.5 * W), reference discrete_group.py:62-66
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    rotp = rotate(xp, angle, padding_mode="zeros")
    ref = center_crop(rotp, (20, 20))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-4)


def test_bilinear_sample_matches_torch_grid_sample():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = _img(b=2, h=12, w=14, c=3, seed=3)
    rng = np.random.default_rng(4)
    # random sample coords inside and outside the image
    sx = jnp.asarray(rng.uniform(-3, 16, size=(2, 7, 9)).astype(np.float32))
    sy = jnp.asarray(rng.uniform(-3, 14, size=(2, 7, 9)).astype(np.float32))
    ours = bilinear_sample(x, sx, sy, padding_mode="zeros")

    # torch grid_sample with align_corners=True: normalized = 2*pix/(size-1) - 1
    tx = torch.tensor(np.asarray(x)).permute(0, 3, 1, 2)
    gx = 2.0 * torch.tensor(np.asarray(sx)) / (14 - 1) - 1.0
    gy = 2.0 * torch.tensor(np.asarray(sy)) / (12 - 1) - 1.0
    grid = torch.stack([gx, gy], dim=-1)
    theirs = F.grid_sample(tx, grid, mode="bilinear", padding_mode="zeros", align_corners=True)
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_bilinear_border_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = _img(b=1, h=10, w=10, c=2, seed=5)
    rng = np.random.default_rng(6)
    sx = jnp.asarray(rng.uniform(-4, 13, size=(1, 6, 6)).astype(np.float32))
    sy = jnp.asarray(rng.uniform(-4, 13, size=(1, 6, 6)).astype(np.float32))
    ours = bilinear_sample(x, sx, sy, padding_mode="border")

    tx = torch.tensor(np.asarray(x)).permute(0, 3, 1, 2)
    gx = 2.0 * torch.tensor(np.asarray(sx)) / 9 - 1.0
    gy = 2.0 * torch.tensor(np.asarray(sy)) / 9 - 1.0
    grid = torch.stack([gx, gy], dim=-1)
    theirs = F.grid_sample(tx, grid, mode="bilinear", padding_mode="border", align_corners=True)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.permute(0, 2, 3, 1).numpy(), atol=1e-5
    )


def test_affine_grid_sample_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = _img(b=3, h=15, w=15, c=2, seed=7)
    rng = np.random.default_rng(8)
    angles = rng.uniform(0, 2 * np.pi, size=3).astype(np.float32)
    theta = np.zeros((3, 2, 3), dtype=np.float32)
    theta[:, 0, 0] = np.cos(angles)
    theta[:, 0, 1] = -np.sin(angles)
    theta[:, 1, 0] = np.sin(angles)
    theta[:, 1, 1] = np.cos(angles)
    theta[:, :, 2] = rng.uniform(-0.2, 0.2, size=(3, 2)).astype(np.float32)

    ours = affine_grid_sample(x, jnp.asarray(theta), padding_mode="zeros")

    tx = torch.tensor(np.asarray(x)).permute(0, 3, 1, 2)
    grid = F.affine_grid(torch.tensor(theta), [3, 2, 15, 15], align_corners=False)
    theirs = F.grid_sample(tx, grid, align_corners=False)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.permute(0, 2, 3, 1).numpy(), atol=1e-5
    )


def test_warp_affine_rotation_consistent_with_rotate():
    """warp_affine with the kornia rotation matrix == rotate()."""
    x = _img(h=21, w=21)
    angle = 25.0
    rad = np.deg2rad(angle)
    a, b = np.cos(rad), np.sin(rad)
    cx = cy = (21 - 1) / 2.0
    # kornia get_rotation_matrix2d: [[a, b, (1-a)cx - b*cy], [-b, a, b*cx + (1-a)cy]]
    M = np.array(
        [[a, b, (1 - a) * cx - b * cy], [-b, a, b * cx + (1 - a) * cy]],
        dtype=np.float32,
    )
    M = np.broadcast_to(M, (2, 2, 3))
    out_wa = warp_affine(x, jnp.asarray(M), padding_mode="zeros")
    out_rot = rotate(x, angle, padding_mode="zeros")
    np.testing.assert_allclose(np.asarray(out_wa), np.asarray(out_rot), atol=1e-4)


def test_hflip():
    x = _img()
    np.testing.assert_allclose(
        np.asarray(hflip(x)), np.asarray(x)[:, :, ::-1, :], atol=0
    )


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_bilinear_slab_bitexact_vs_taps(padding_mode):
    """The paired-slice gather form is bit-identical to the 4-tap form for
    both padding modes, including far out-of-range coordinates (corner
    clipping) and non-square/odd sizes."""
    from equiadapt_tpu.ops.warp import _bilinear_sample_slab, bilinear_sample

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(3, 13, 17, 5)).astype(np.float32))
    B, H, W, _ = x.shape
    sx = jnp.asarray(rng.uniform(-6, W + 6, size=(B, 9, 11)).astype(np.float32))
    sy = jnp.asarray(rng.uniform(-6, H + 6, size=(B, 9, 11)).astype(np.float32))
    import os

    os.environ["EQUIADAPT_BILINEAR_GATHER"] = "taps"
    try:
        ref = bilinear_sample(x, sx, sy, padding_mode=padding_mode)
    finally:
        del os.environ["EQUIADAPT_BILINEAR_GATHER"]
    slab = _bilinear_sample_slab(x, sx, sy, padding_mode=padding_mode)
    assert bool((ref == slab).all())


def test_bilinear_slab_gradients_match():
    """d/dx of the slab form matches the 4-tap form (exact-mode training
    differentiates through bilinear_sample)."""
    import jax

    from equiadapt_tpu.ops.warp import _bilinear_sample_slab, bilinear_sample

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    sx = jnp.asarray(rng.uniform(-1, 8, size=(2, 8, 8)).astype(np.float32))
    sy = jnp.asarray(rng.uniform(-1, 8, size=(2, 8, 8)).astype(np.float32))
    import os

    os.environ["EQUIADAPT_BILINEAR_GATHER"] = "taps"
    try:
        g_ref = jax.grad(
            lambda xx: jnp.sum(bilinear_sample(xx, sx, sy, "border") ** 2)
        )(x)
    finally:
        del os.environ["EQUIADAPT_BILINEAR_GATHER"]
    g_slab = jax.grad(
        lambda xx: jnp.sum(_bilinear_sample_slab(xx, sx, sy, "border") ** 2)
    )(x)
    np.testing.assert_allclose(
        np.asarray(g_ref), np.asarray(g_slab), rtol=1e-6, atol=1e-6
    )


def test_slab_gather_nonfinite_coordinate_fence():
    """Non-finite sample coordinates (zero-vector -> NaN rotation on an
    all-zeros init batch) must produce the taps form's NaN pattern, never
    wild PROMISE_IN_BOUNDS indices — int32(NaN) reaching an unclamped
    gather is the likeliest round-4 slab TPU fault (BENCH_r04 rc=1)."""
    from equiadapt_tpu.ops.warp import _bilinear_sample_slab, bilinear_sample

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    sx = jnp.asarray(rng.uniform(-3, 19, size=(2, 16, 16)).astype(np.float32))
    sy = jnp.asarray(rng.uniform(-3, 19, size=(2, 16, 16)).astype(np.float32))
    sx = sx.at[0, 0, 0].set(jnp.nan)
    sy = sy.at[0, 0, 1].set(jnp.inf)
    sy = sy.at[1, 2, 3].set(-jnp.inf)
    for pm in ("zeros", "border"):
        a = np.asarray(_bilinear_sample_slab(x, sx, sy, pm))
        b = np.asarray(bilinear_sample(x, sx, sy, pm))
        assert (np.isnan(a) == np.isnan(b)).all()
        assert np.nanmax(np.abs(a - b)) == 0.0
