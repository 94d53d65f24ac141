"""Single-pass select kernel == hard-one-hot rotate_discrete (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equiadapt_tpu.ops.pallas.select_warp import pallas_rotate_select, rotate_select
from equiadapt_tpu.ops.warp import rotate_discrete


def _x(b=4, h=16, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(b, h, h, c)).astype(np.float32))


@pytest.mark.parametrize("n", [1, 2, 4, 8])
@pytest.mark.parametrize("sign", [-1.0, 1.0])
def test_select_matches_blend(n, sign):
    x = _x(b=max(n, 2))
    idx = jnp.arange(x.shape[0]) % n
    sel = pallas_rotate_select(x, idx, n, sign=sign, padding_mode="border",
                               interpret=True)
    onehot = jax.nn.one_hot(idx, n)
    blend = rotate_discrete(x, onehot, n, sign=sign, padding_mode="border")
    np.testing.assert_allclose(np.asarray(sel), np.asarray(blend), atol=1e-5)


@pytest.mark.parametrize("sign", [-1.0, 1.0])
@pytest.mark.parametrize("padding", ["border", "zeros"])
def test_select2_fast_matches_xla_fast_path(sign, padding):
    """The two-source C8 fast kernel (no stacked copy) must be bit-identical
    to rotate_select_fast — same twopass-45 source, same exact rot90s."""
    from equiadapt_tpu.ops.warp import rotate_select_fast

    x = _x(b=8)
    idx = jnp.arange(8)
    sel = pallas_rotate_select(x, idx, 8, sign=sign, padding_mode=padding,
                               interpret=True, mode="fast")
    ref = rotate_select_fast(x, idx, 8, sign=sign, padding_mode=padding)
    assert bool((sel == ref).all())


def test_select2_fast_wide_fiber_channels():
    """Invert-path shape: regular-rep feature maps have C = fields * |G|."""
    from equiadapt_tpu.ops.warp import rotate_select_fast

    x = _x(b=4, h=16, c=16)
    idx = jnp.asarray([0, 3, 5, 7])
    sel = pallas_rotate_select(x, idx, 8, sign=1.0, padding_mode="zeros",
                               interpret=True, mode="fast")
    ref = rotate_select_fast(x, idx, 8, sign=1.0, padding_mode="zeros")
    assert bool((sel == ref).all())


@pytest.mark.parametrize("n", [4, 8])
def test_rotate_roll_select_fuses_roll_bitexact(n):
    """Fused rotate+roll kernel == rotate_select(fast) then roll_by_gather."""
    from equiadapt_tpu.ops.group_action import roll_by_gather
    from equiadapt_tpu.ops.pallas.select_warp import rotate_roll_select
    from equiadapt_tpu.ops.warp import rotate_select_fast

    B, G, F = 8, n, 2
    x = _x(b=B, h=16, c=F * G, seed=3)
    idx = jnp.arange(B) % n
    shift = (idx * (360.0 // n) / 360.0 * n).astype(jnp.int32)
    fused = rotate_roll_select(x, idx, shift, n, 1.0, "zeros", interpret=True)
    ref = rotate_select_fast(x, idx, n, 1.0, "zeros")
    ref = roll_by_gather(
        ref.reshape(B, 16, 16, F, G), shift.astype(jnp.float32)
    ).reshape(B, 16, 16, F * G)
    assert bool((fused == ref).all())


@pytest.mark.parametrize("n", [4, 8])
def test_rotate_roll_select_exact_mode_bitexact(n):
    """mode="exact" fused invert == static-tap blend then roll_by_gather
    (the round-4 exact-eval invert routing, group_action.py fused_ok)."""
    import jax

    from equiadapt_tpu.ops.group_action import roll_by_gather
    from equiadapt_tpu.ops.pallas.select_warp import (
        _blend_ref,
        rotate_roll_select,
    )

    B, G, F = 8, n, 2
    x = _x(b=B, h=16, c=F * G, seed=4)
    idx = jnp.arange(B) % n
    shift = idx.astype(jnp.int32)
    fused = rotate_roll_select(
        x, idx, shift, n, 1.0, "zeros", interpret=True, mode="exact"
    )
    ref = _blend_ref(x, idx, n, 1.0, "zeros")
    ref = roll_by_gather(
        ref.reshape(B, 16, 16, F, G), shift.astype(jnp.float32)
    ).reshape(B, 16, 16, F * G)
    assert bool((fused == ref).all())


def test_rotate_select_dispatch_fallback_cpu():
    # on CPU the wrapper falls back to the blend path
    x = _x()
    idx = jnp.asarray([0, 1, 2, 3])
    out = rotate_select(x, idx, 4)
    expect = rotate_discrete(x, jax.nn.one_hot(idx, 4), 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-6)


def test_rotate_select_gradient_is_blend_transpose():
    x = _x(b=4)
    idx = jnp.asarray([0, 1, 2, 3])

    def loss_sel(xx):
        return jnp.sum(rotate_select(xx, idx, 4, -1.0, "border") ** 2)

    def loss_blend(xx):
        return jnp.sum(
            rotate_discrete(xx, jax.nn.one_hot(idx, 4), 4, -1.0, "border") ** 2
        )

    g1 = jax.grad(loss_sel)(x)
    g2 = jax.grad(loss_blend)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


@pytest.mark.parametrize("n", [4, 8])
def test_rotate_roll_select_dn_reflection(n):
    """D_n fused invert (interpret) == the XLA fallback path: rotate(+theta),
    hard hflip blend, split-fiber +/-shift rolls."""
    from equiadapt_tpu.ops.group_action import get_action_on_image_features
    from equiadapt_tpu.ops.pallas.select_warp import rotate_roll_select

    B, F = 8, 2
    G = 2 * n
    x = _x(b=B, h=16, c=F * G, seed=5)
    idx = jnp.arange(B) % n
    deg = idx * (360.0 / n)
    refl = jnp.arange(B) % 2  # alternate reflected samples
    shift = idx
    fused = rotate_roll_select(
        x, idx, shift, n, 1.0, "zeros",
        refl=refl.astype(jnp.int32), interpret=True,
    )
    ref = get_action_on_image_features(
        x, num_rotations=n, num_group=G, rotation_deg=deg,
        reflection=refl.astype(jnp.float32), induced_rep_type="regular",
        mode="fast",
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)


def test_pallas_rotate_select_nchw_matches_nhwc_entry():
    """The NCHW-spine entry returns the same planes as the NHWC entry
    (same residual einsums, same kernel) for C8 fast mode."""
    import numpy as np

    from equiadapt_tpu.ops.pallas.select_warp import (
        pallas_rotate_select, pallas_rotate_select_nchw,
    )

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(6, 16, 16, 3)).astype(np.float32))
    idx = jnp.asarray([0, 1, 2, 3, 5, 7], jnp.int32)
    ref = pallas_rotate_select(x, idx, 8, -1.0, "border", interpret=True,
                               mode="fast")
    out = pallas_rotate_select_nchw(
        jnp.moveaxis(x, -1, 1), idx, 8, -1.0, "border", interpret=True
    )
    assert bool((jnp.moveaxis(out, 1, -1) == ref).all())


def test_pallas_rotate_select_nchw_c4_single_source():
    import numpy as np

    from equiadapt_tpu.ops.pallas.select_warp import (
        pallas_rotate_select, pallas_rotate_select_nchw,
    )

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(4, 16, 16, 3)).astype(np.float32))
    idx = jnp.asarray([0, 1, 2, 3], jnp.int32)
    ref = pallas_rotate_select(x, idx, 4, -1.0, "border", interpret=True,
                               mode="fast")
    out = pallas_rotate_select_nchw(
        jnp.moveaxis(x, -1, 1), idx, 4, -1.0, "border", interpret=True
    )
    assert bool((jnp.moveaxis(out, 1, -1) == ref).all())


def test_pallas_rotate_select_nchw_exact_mode():
    """Exact-mode NCHW entry (static-tap residual sources) matches the
    NHWC exact entry bit for bit."""
    import numpy as np

    from equiadapt_tpu.ops.pallas.select_warp import (
        pallas_rotate_select, pallas_rotate_select_nchw,
    )

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(6, 16, 16, 3)).astype(np.float32))
    idx = jnp.asarray([0, 1, 2, 3, 5, 7], jnp.int32)
    ref = pallas_rotate_select(x, idx, 8, -1.0, "border", interpret=True,
                               mode="exact")
    out = pallas_rotate_select_nchw(
        jnp.moveaxis(x, -1, 1), idx, 8, -1.0, "border", interpret=True,
        mode="exact",
    )
    assert bool((jnp.moveaxis(out, 1, -1) == ref).all())


def test_rotate_select_nchw_grad_through_eval(monkeypatch):
    """Eval-mode canonicalize on the NCHW spine stays differentiable in x
    (round-2 contract): the custom VJP is the linear transpose of the
    matching NHWC fast select."""
    import numpy as np

    from equiadapt_tpu.ops.pallas.select_warp import rotate_select_nchw
    from equiadapt_tpu.ops.warp import rotate_select_fast

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(4, 3, 16, 16)).astype(np.float32))
    idx = jnp.asarray([0, 1, 5, 7], jnp.int32)
    g = jnp.asarray(rng.normal(size=(4, 3, 16, 16)).astype(np.float32))

    def via_kernel(xx):
        return jnp.sum(
            rotate_select_nchw(xx, idx, 8, -1.0, "border", "fast", True) * g
        )

    def via_blend(xx):
        nhwc = jnp.moveaxis(xx, 1, -1)
        out = rotate_select_fast(nhwc, idx, 8, -1.0, "border")
        return jnp.sum(jnp.moveaxis(out, -1, 1) * g)

    gk = jax.grad(via_kernel)(x)
    gb = jax.grad(via_blend)(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gb), rtol=1e-5)


def test_rot90_mixed_strategy_bitexact(monkeypatch):
    """EQUIADAPT_ROT90_STRATEGY=mixed (bf16 operands + explicit transposes
    in the kernel rot90) must be bit-identical to the default fp32
    exchange-matmul strategy for bf16 payloads, and a no-op for fp32."""
    import numpy as np

    from equiadapt_tpu.ops.pallas.select_warp import pallas_rotate_select

    rng = np.random.default_rng(3)
    x32 = jnp.asarray(rng.normal(size=(6, 16, 16, 3)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 8, size=(6,)).astype(np.int32))
    for x in (x32, x32.astype(jnp.bfloat16)):
        monkeypatch.setenv("EQUIADAPT_ROT90_STRATEGY", "fp32")
        ref = pallas_rotate_select(x, idx, 8, -1.0, "border", interpret=True)
        monkeypatch.setenv("EQUIADAPT_ROT90_STRATEGY", "mixed")
        out = pallas_rotate_select(x, idx, 8, -1.0, "border", interpret=True)
        assert out.dtype == x.dtype
        assert bool((out == ref).all())


def test_nhwc_interleaved_select_matches_blend_all_modes():
    """The NHWC-native interleaved kernel (round 4: zero transpose copies
    on either side of the select) is bit-identical to the blend reference
    for both warp modes, C in {1, 3, 4}, and both payload dtypes (the
    exact-mode bf16 comparison happens after the blend's single final
    round, which is where the canonicalizer casts — same contract as the
    NCHW kernel's pre-cast sources)."""
    import numpy as np

    from equiadapt_tpu.ops.pallas.select_warp import (
        _blend_ref,
        pallas_rotate_select_nhwc,
    )
    from equiadapt_tpu.ops.warp import rotate_select_fast

    rng = np.random.default_rng(7)
    for C, n in [(1, 4), (3, 8), (4, 12)]:
        x32 = jnp.asarray(
            rng.normal(size=(6, 24, 24, C)).astype(np.float32)
        )
        idx = jnp.asarray(rng.integers(0, n, size=(6,)).astype(np.int32))
        for x in (x32, x32.astype(jnp.bfloat16)):
            fast = pallas_rotate_select_nhwc(
                x, idx, n, -1.0, "border", interpret=True, mode="fast"
            )
            ref_fast = rotate_select_fast(x, idx, n, -1.0, "border")
            assert fast.dtype == x.dtype
            assert bool((fast == ref_fast.astype(x.dtype)).all()), (C, n, x.dtype)
            exact = pallas_rotate_select_nhwc(
                x, idx, n, -1.0, "border", interpret=True, mode="exact"
            )
            ref_exact = _blend_ref(x, idx, n, -1.0, "border").astype(x.dtype)
            assert bool((exact == ref_exact).all()), (C, n, x.dtype)


def test_nhwc_interleaved_matches_nchw_kernel():
    """NHWC and NCHW steered kernels agree element-for-element (same
    residual warps, same reversal algebra in a different layout)."""
    import numpy as np

    from equiadapt_tpu.ops.pallas.select_warp import (
        pallas_rotate_select,
        pallas_rotate_select_nhwc,
    )

    rng = np.random.default_rng(9)
    x = jnp.asarray(
        rng.normal(size=(5, 16, 16, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, 8, size=(5,)).astype(np.int32))
    for mode in ("fast", "exact"):
        a = pallas_rotate_select_nhwc(
            x, idx, 8, -1.0, "border", interpret=True, mode=mode
        )
        b = pallas_rotate_select(
            x, idx, 8, -1.0, "border", interpret=True, mode=mode
        )
        assert bool((a == b).all()), mode


def test_selectn_grouped_bitexact_vs_per_sample():
    """bt=2 grouped steering == bt=1 per-sample steering, bit-for-bit.

    The group fetches every source any of its samples uses; the in-kernel
    per-sample select/rot90 algebra is unchanged, so values must match
    exactly (round-4 pairing win, EQUIADAPT_SELECT_PAIR)."""
    import numpy as np

    from equiadapt_tpu.ops.pallas.select_warp import _pallas_selectn

    rng = np.random.default_rng(11)
    B, C, H, W = 8, 3, 16, 16
    s0 = jnp.asarray(rng.normal(size=(B, C, H, W)).astype(np.float32))
    s1 = jnp.asarray(rng.normal(size=(B, C, H, W)).astype(np.float32))
    src = jnp.asarray(rng.integers(0, 2, size=(B,)).astype(np.int32))
    k = jnp.asarray(rng.integers(0, 4, size=(B,)).astype(np.int32))
    a = _pallas_selectn((s0, s1), src, k, interpret=True, bt=1)
    b = _pallas_selectn((s0, s1), src, k, interpret=True, bt=2)
    assert bool((a == b).all())
    # odd batch: bt falls back to 1 (shape guard), still correct
    c = _pallas_selectn(
        (s0[:7], s1[:7]), src[:7], k[:7], interpret=True, bt=2
    )
    assert bool((a[:7] == c).all())
