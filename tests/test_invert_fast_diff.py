"""Training-mode fused invert: forward bit-parity + gradient quality.

The round-2 fused invert kernel was eval-only; `invert_regular_fast_diff`
extends it to training via a custom VJP (angle-pathway gradients, the
reference's own gradient semantics for the spatial rotation at
discrete_group.py:213). These tests run the kernels in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equiadapt_tpu.ops.group_action import (
    invert_regular_fast_diff,
    roll_by_gather,
)
from equiadapt_tpu.ops.pallas.select_warp import rotate_roll_select
from equiadapt_tpu.ops.warp import group_angles, hflip, rotate, rotate_select_fast


def _smooth(key, b, size, c):
    coarse = jax.random.uniform(key, (b, size // 8, size // 8, c))
    return jax.image.resize(coarse, (b, size, size, c), method="cubic")


def _unfused(fm, idx, n):
    """rotate_select_fast + roll_by_gather composition (the fused kernel's
    bit-parity reference)."""
    B, H, W, C = fm.shape
    y = rotate_select_fast(fm, idx, n, 1.0, "zeros")
    y = y.reshape(B, H, W, C // n, n)
    return roll_by_gather(y, idx.astype(jnp.float32)).reshape(B, H, W, C)


@pytest.mark.parametrize("n", [4, 6, 8, 12])
def test_rotate_roll_select_bitexact_all_orders(n):
    """Eval fused kernel == unfused composition, bit for bit, for every
    C_n order the residual decomposition covers (C6/C12 are new in r3)."""
    key = jax.random.key(0)
    fm = jax.random.normal(key, (n, 32, 32, 2 * n))
    idx = jnp.arange(n, dtype=jnp.int32)
    fused = rotate_roll_select(fm, idx, idx, n, 1.0, "zeros", interpret=True)
    ref = _unfused(fm, idx, n)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_diff_invert_forward_matches_eval_kernel():
    n = 8
    fm = jax.random.normal(jax.random.key(1), (8, 32, 32, 16))
    idx = jnp.arange(8, dtype=jnp.int32)
    onehot = jax.nn.one_hot(idx, n)
    out = invert_regular_fast_diff(fm, onehot, None, n, True)
    ref = rotate_roll_select(fm, idx, idx, n, 1.0, "zeros", interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_diff_invert_xbar_exact_for_c4():
    """C4 elements are pure permutations: the transpose input-cotangent is
    exactly the blend path's autodiff."""
    n = 4
    fm = _smooth(jax.random.key(2), 4, 32, 8)
    idx = jnp.asarray([0, 1, 2, 3], jnp.int32)
    onehot = jax.nn.one_hot(idx, n)
    w = jax.random.normal(jax.random.key(3), fm.shape)

    def loss_fast(f):
        return jnp.sum(invert_regular_fast_diff(f, onehot, None, n, True) * w)

    def loss_ref(f):
        return jnp.sum(_unfused(f, idx, n) * w)

    gf = jax.grad(loss_fast)(fm)
    gr = jax.grad(loss_ref)(fm)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-5)


def test_diff_invert_onehot_grad_matches_angle_pathway():
    """The one-hot gradient tracks the reference's angle-pathway autodiff
    (kornia-rotate-through-the-angle) in direction and magnitude."""
    n = 8
    fm = _smooth(jax.random.key(4), 8, 64, 16)
    idx = jnp.asarray([0, 1, 2, 3, 4, 5, 6, 7], jnp.int32)
    onehot = jax.nn.one_hot(idx, n)
    w = _smooth(jax.random.key(5), 8, 64, 16)
    angles = group_angles(n)

    def loss_fast(oh):
        return jnp.sum(invert_regular_fast_diff(fm, oh, None, n, True) * w)

    # inscribed-disk mask: the raw angle-pathway gradient is ~100x
    # dominated by its zeros-padding boundary ring (pure discretization
    # noise, not training signal); the fused VJP integrates over the valid
    # disk, so the reference comparison does too
    H = W = 64
    px = jnp.arange(W) - (W - 1) / 2
    py = jnp.arange(H) - (H - 1) / 2
    rad2 = px[None, None, :] ** 2 + py[None, :, None] ** 2
    disk = (rad2 <= (H / 2.0 - 2.0) ** 2).astype(jnp.float32)[..., None]

    def loss_ref(oh):
        deg = jnp.sum(oh * angles, axis=-1)
        y = rotate(fm, deg, padding_mode="zeros")
        B, H, W, C = y.shape
        y = y.reshape(B, H, W, C // n, n)
        y = roll_by_gather(y, jax.lax.stop_gradient(deg) / 360.0 * n)
        return jnp.sum(y.reshape(B, H, W, C) * w * disk)

    gf = np.asarray(jax.grad(loss_fast)(onehot))
    gr = np.asarray(jax.grad(loss_ref)(onehot))
    # angle-pathway gradients live along the angle table direction; compare
    # the per-sample effective dLoss/dtheta
    df = gf @ np.asarray(angles)
    dr = gr @ np.asarray(angles)
    assert np.corrcoef(df, dr)[0, 1] > 0.95, (df, dr)
    ratio = np.linalg.norm(df) / (np.linalg.norm(dr) + 1e-9)
    assert 0.5 < ratio < 2.0, ratio


def test_diff_invert_reflection_grad_matches_blend():
    """D4: the closed-form reflection derivative equals the blend
    derivative evaluated at the hard branch."""
    n = 4
    fm = _smooth(jax.random.key(6), 4, 32, 8)  # C = 8 = 1 field x 2n
    idx = jnp.asarray([0, 1, 2, 3], jnp.int32)
    onehot = jax.nn.one_hot(idx, n)
    refl = jnp.asarray([0.0, 1.0, 0.0, 1.0])
    w = jax.random.normal(jax.random.key(7), fm.shape)

    def loss_fast(r):
        return jnp.sum(invert_regular_fast_diff(fm, onehot, r, n, True) * w)

    def loss_ref(r):
        B, H, W, C = fm.shape
        y = rotate_select_fast(fm, idx, n, 1.0, "zeros")
        rr = r[:, None, None, None]
        y = (1.0 - rr) * y + rr * hflip(y)
        y5 = y.reshape(B, H, W, C // (2 * n), 2 * n)
        rot_f = roll_by_gather(y5[..., :n], idx.astype(jnp.float32))
        ref_f = roll_by_gather(y5[..., n:], -idx.astype(jnp.float32))
        y = jnp.concatenate([rot_f, ref_f], axis=-1).reshape(B, H, W, C)
        return jnp.sum(y * w)

    gf = np.asarray(jax.grad(loss_fast)(refl))
    gr = np.asarray(jax.grad(loss_ref)(refl))
    # forward orders differ (flip before/after roll commute), gradients at
    # the hard branch should agree
    np.testing.assert_allclose(gf, gr, rtol=1e-4, atol=1e-4)
