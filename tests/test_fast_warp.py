"""Fast-mode warp path: two-pass MXU rotation + fast hard select.

The fast mode trades bit-parity on non-90-degree angles for MXU-friendly
batched matmuls (ops/warp.rotate_twopass). Contracts verified here:

* 90-degree multiples are pure rot90 permutations — bit-exact, in both
  rotate_twopass and rotate_select_fast.
* Odd C8 elements (45-degree residual) stay close to the exact 4-tap
  bilinear warp on band-limited (smooth) images.
* The fast select is linear in x with a working VJP; gradients flow.
* The canonicalizer in warp_mode="fast" keeps the invariance property.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equiadapt_tpu.ops.pallas.select_warp import rotate_select
from equiadapt_tpu.ops.warp import (
    rotate,
    rotate_discrete,
    rotate_select_fast,
    rotate_twopass,
)


def _smooth_images(key, b, size, c=3):
    """Band-limited test images: avg-pooled upsampled noise in [0, 1]."""
    coarse = jax.random.uniform(key, (b, size // 8, size // 8, c))
    return jax.image.resize(coarse, (b, size, size, c), method="cubic")


@pytest.mark.parametrize("k", [0, 1, 2, 3])
def test_twopass_quarter_turns_bit_exact(k):
    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    out = rotate_twopass(x, 90.0 * k)
    ref = jnp.rot90(x, k=k, axes=(1, 2))
    assert (out == ref).all()


def _disk_mask(size):
    """Inscribed-disk mask: outside it both warps sample clamped border
    extension (arbitrary corner smear, like the reference's edge-pad/crop),
    so only the interior is numerically comparable."""
    c = (size - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(size), jnp.arange(size), indexing="ij")
    return ((yy - c) ** 2 + (xx - c) ** 2 <= (c - 1) ** 2)[None, :, :, None]


@pytest.mark.parametrize("angle", [45.0, 135.0, 225.0, 315.0, -45.0, 30.0])
def test_twopass_close_to_exact_on_smooth_images(angle):
    x = _smooth_images(jax.random.key(1), 2, 64)
    exact = rotate(x, jnp.full((2,), angle), padding_mode="border")
    fast = rotate_twopass(x, angle, padding_mode="border")
    err = jnp.abs(exact - fast) * _disk_mask(64)
    assert float(err.max()) < 0.06, float(err.max())
    assert float(jnp.sqrt(jnp.mean(err**2))) < 0.01


def test_twopass_zeros_padding_close():
    x = _smooth_images(jax.random.key(2), 2, 64)
    exact = rotate(x, jnp.full((2,), 45.0), padding_mode="zeros")
    fast = rotate_twopass(x, 45.0, padding_mode="zeros")
    # corners differ by the pass decomposition; compare the valid interior
    err = jnp.abs(exact - fast)[:, 16:-16, 16:-16, :]
    assert float(err.max()) < 0.06, float(err.max())


def test_select_fast_even_elements_bit_exact():
    x = jax.random.normal(jax.random.key(3), (8, 32, 32, 3))
    idx = jnp.asarray([0, 2, 4, 6, 0, 2, 4, 6], jnp.int32)
    fast = rotate_select_fast(x, idx, 8, sign=-1.0, padding_mode="border")
    onehot = jax.nn.one_hot(idx, 8, dtype=x.dtype)
    exact = rotate_discrete(x, onehot, 8, sign=-1.0, padding_mode="border")
    assert (fast == exact).all()


def test_select_fast_odd_elements_close_on_smooth_images():
    x = _smooth_images(jax.random.key(4), 8, 64)
    idx = jnp.asarray([1, 3, 5, 7, 1, 3, 5, 7], jnp.int32)
    fast = rotate_select_fast(x, idx, 8, sign=-1.0, padding_mode="border")
    onehot = jax.nn.one_hot(idx, 8, dtype=x.dtype)
    exact = rotate_discrete(x, onehot, 8, sign=-1.0, padding_mode="border")
    err = jnp.abs(fast - exact) * _disk_mask(64)
    assert float(err.max()) < 0.06, float(err.max())


def test_rotate_select_fast_mode_dispatch_and_vjp():
    x = _smooth_images(jax.random.key(5), 4, 32)
    idx = jnp.asarray([0, 1, 2, 3], jnp.int32)

    def f(xx):
        return jnp.sum(rotate_select(xx, idx, 8, -1.0, "border", "fast") ** 2)

    g = jax.grad(f)(x)
    assert g.shape == x.shape
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0

    # linearity: the VJP of a linear map satisfies <g, f(x)> == <f^T(g), x>
    y = rotate_select(x, idx, 8, -1.0, "border", "fast")
    gg = jax.random.normal(jax.random.key(6), y.shape)
    _, vjp = jax.vjp(lambda xx: rotate_select(xx, idx, 8, -1.0, "border", "fast"), x)
    (xbar,) = vjp(gg)
    lhs = float(jnp.sum(gg * y))
    rhs = float(jnp.sum(xbar * x))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_rotate_discrete_fast_mode_gradients_flow_to_onehot():
    x = _smooth_images(jax.random.key(7), 4, 32)
    onehot = jax.nn.softmax(jax.random.normal(jax.random.key(8), (4, 8)))

    def f(oh):
        return jnp.sum(rotate_discrete(x, oh, 8, -1.0, "border", mode="fast") ** 2)

    g = jax.grad(f)(onehot)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0


def test_canonicalizer_fast_bf16_matches_exact_fp32():
    """bf16-fast canonicalization tracks the exact fp32 path.

    With an untrained energy net the group activations are near-tied, so
    bf16 may legitimately select a different element on some samples; on
    samples where the selections agree, the canonical images must be close
    (bf16 warp precision). Dtype contract: output keeps the input dtype.
    """
    from equiadapt_tpu.images import (
        EquivariantNetwork,
        GroupEquivariantImageCanonicalization,
    )

    net = EquivariantNetwork(
        in_channels=3, out_channels=8, kernel_size=3, group_type="rotation",
        num_rotations=4, num_layers=2,
    )
    kw = dict(
        canonicalization_network=net, in_shape=(32, 32, 3),
        num_rotations=4, group_type="rotation",
    )
    fast = GroupEquivariantImageCanonicalization(
        warp_mode="fast", compute_dtype=jnp.bfloat16, **kw
    )
    exact = GroupEquivariantImageCanonicalization(**kw)
    x = _smooth_images(jax.random.key(9), 8, 32)
    params = exact.init(jax.random.key(10), x, training=False)
    xc_f, info_f = fast.apply(params, x, training=False)
    xc_e, info_e = exact.apply(params, x, training=False)
    assert xc_f.dtype == x.dtype
    agree = info_f.onehot.argmax(-1) == info_e.onehot.argmax(-1)
    assert bool(agree.any()), "all selections flipped; pick a new seed"
    diff = jnp.abs(xc_f - xc_e).max(axis=(1, 2, 3))
    assert float(jnp.where(agree, diff, 0.0).max()) < 0.05, diff


# ---------------------------------------------------------------------------
# differentiable fast continuous warp (warp_center_rotation_fast_diff)
# ---------------------------------------------------------------------------


def _rotmats(angles):
    c, s = jnp.cos(angles), jnp.sin(angles)
    return jnp.stack(
        [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], axis=-2
    )


def test_fast_diff_warp_forward_matches_fast_kernel():
    from equiadapt_tpu.ops.pallas.shear_rotate import warp_rotate_center_fast
    from equiadapt_tpu.ops.warp import warp_center_rotation_fast_diff

    x = _smooth_images(jax.random.key(20), 4, 32)
    R = _rotmats(jnp.asarray([0.3, -1.2, 2.0, 0.0]))
    out = warp_center_rotation_fast_diff(x, R, "border")
    ref = warp_rotate_center_fast(x, R, "border")
    assert (out == ref).all()


def test_fast_diff_warp_grad_R_matches_exact_warp():
    """Closed-form R-gradient tracks exact-warp autodiff on smooth images
    (direction within a few degrees, magnitude within ~20%)."""
    from equiadapt_tpu.images.canonicalization.continuous_group import (
        _warp_center_affine,
    )
    from equiadapt_tpu.ops.warp import warp_center_rotation_fast_diff

    x = _smooth_images(jax.random.key(21), 4, 64)
    weight = _smooth_images(jax.random.key(22), 4, 64)
    R = _rotmats(jnp.asarray([0.25, -0.9, 1.7, 2.9]))

    def loss_exact(Rm):
        return jnp.sum(_warp_center_affine(x, Rm, "border") * weight)

    def loss_fast(Rm):
        return jnp.sum(warp_center_rotation_fast_diff(x, Rm, "border") * weight)

    g_exact = jax.grad(loss_exact)(R)
    g_fast = jax.grad(loss_fast)(R)
    assert bool(jnp.isfinite(g_fast).all())
    ge = np.asarray(g_exact).reshape(4, -1)
    gf = np.asarray(g_fast).reshape(4, -1)
    for b in range(4):
        cos = ge[b] @ gf[b] / (np.linalg.norm(ge[b]) * np.linalg.norm(gf[b]))
        assert cos > 0.98, (b, cos)
        ratio = np.linalg.norm(gf[b]) / np.linalg.norm(ge[b])
        assert 0.8 < ratio < 1.25, (b, ratio)


def test_fast_diff_warp_xbar_adjoint_property():
    """<g, W(x)> ~ <W^T(g), x>: the inverse-warp input cotangent is a good
    adjoint for rotations (sample ~ splat on smooth cotangents)."""
    from equiadapt_tpu.ops.warp import warp_center_rotation_fast_diff

    x = _smooth_images(jax.random.key(23), 2, 64)
    g = _smooth_images(jax.random.key(24), 2, 64)
    R = _rotmats(jnp.asarray([0.35, -1.1]))
    y, vjp = jax.vjp(lambda xx: warp_center_rotation_fast_diff(xx, R, "zeros"), x)
    xbar, = vjp(g)
    lhs = float(jnp.sum(g * y))
    rhs = float(jnp.sum(xbar * x))
    np.testing.assert_allclose(lhs, rhs, rtol=0.05)


def test_continuous_canonicalizer_fast_training_grads_and_output():
    """warp_mode='fast' + training=True: gradients reach the
    canonicalization network through the custom-vjp warp, and the training
    forward stays close to the exact warp (regression for BENCH_r02's
    693 ms exact-only training path)."""
    import flax.linen as nn

    from equiadapt_tpu.images.canonicalization.continuous_group import (
        SteerableImageCanonicalization,
    )

    class TinyVec(nn.Module):
        @nn.compact
        def __call__(self, x, training=False):
            h = jnp.mean(x, axis=(1, 2))
            v = nn.Dense(2, kernel_init=nn.initializers.normal(1.0))(h)
            return v[:, None, :]

    kw = dict(canonicalization_network=TinyVec(), in_shape=(32, 32, 3))
    fast = SteerableImageCanonicalization(warp_mode="fast", **kw)
    exact = SteerableImageCanonicalization(**kw)
    x = _smooth_images(jax.random.key(25), 4, 32)
    params = exact.init(jax.random.key(26), x, training=True)

    def loss(p, model):
        xc, info = model.apply(p, x, training=True)
        return jnp.sum(xc ** 2)

    g_fast = jax.grad(loss)(params, fast)
    leaves = jax.tree_util.tree_leaves(g_fast)
    norm = float(jnp.sqrt(sum(jnp.sum(l ** 2) for l in leaves)))
    assert np.isfinite(norm) and norm > 0

    xc_f, _ = fast.apply(params, x, training=True)
    xc_e, _ = exact.apply(params, x, training=True)
    err = jnp.abs(xc_f - xc_e) * _disk_mask(32)
    assert float(err.max()) < 0.06, float(err.max())


def test_rotate_twopass_from_nchw_matches_nhwc_in():
    """NCHW-in twopass == NHWC-in twopass (same contraction axes/order)."""
    import numpy as np

    from equiadapt_tpu.ops.warp import (
        rotate_twopass_from_nchw, rotate_twopass_nchw,
    )

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(3, 20, 20, 3)).astype(np.float32))
    a = rotate_twopass_nchw(x, 45.0, "border")
    b = rotate_twopass_from_nchw(jnp.moveaxis(x, -1, 1), 45.0, "border")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
