"""Pallas TPU kernel: per-sample continuous-angle rotation via in-VMEM shears.

The continuous (steerable) canonicalizers rotate each image by an arbitrary
per-sample angle (reference continuous_group.py:207 warp_affine). The
dynamic 4-tap gather that implements this at the XLA level runs ~2 GB/s on
the target runtime (docs/benchmarking.md) — the pathological op class. This
kernel replaces it for eval:

    Rot(phi) = Rot90^k . Rot(r),  r in [-45, 45] degrees
    Rot(r)   = Sx(alpha) . Sy(beta) . Sx(alpha),
               alpha = -tan(r/2), beta = sin(r)

The 90-degree part is applied outside the kernel as an exact lattice
permutation (one-hot blend of rot90s about the warp center). Each shear is
a 1-D fractional translation whose shift varies only along the
*perpendicular* axis, so it lowers to masked static lane/sublane rolls:
binary-decomposed shift bits select between rolled and unrolled copies —
per-row (or per-column) data never crosses rows, making the routing exact.
All compute stays in VMEM: one HBM read and one write per image.

Numerics: the 3-shear lattice differs from direct 4-tap bilinear by a
small interpolation residual (same class as ops/warp.rotate_twopass, bounds
in tests/test_shear_rotate.py); angles at exact 90-degree multiples have
identity shears and are bit-exact. Border semantics: "border" clamps taps
to the image edge, "zeros" zeroes out-of-range taps — matching
ops/warp.bilinear_sample per 1-D pass.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

Array = jnp.ndarray

__all__ = ["shear_rotate_residual", "warp_rotate_center_fast"]

# |r| <= 45deg -> |alpha| <= tan(22.5), |beta| <= sin(45)
_ALPHA_MAX = math.tan(math.pi / 8) + 1e-3
_BETA_MAX = math.sin(math.pi / 4) + 1e-3


def _max_shift(slope_max: float, size: int, center: float) -> int:
    return int(math.ceil(slope_max * max(center, size - 1 - center))) + 1


def _shear_kernel_body(img2, slope, *, axis, H, W, C, center, K, padding_mode):
    """One shear pass on a (H, W*C) tile.

    axis=1: x-shear — out[h, w] = img[h, w + slope*(h - center)], rolls along
    lanes (shift per sublane row).
    axis=0: y-shear — out[h, w] = img[h + slope*(w - center), w], rolls along
    sublanes (shift per lane column).
    """
    from jax.experimental.pallas import tpu as pltpu

    WC = W * C
    dt = img2.dtype
    if axis == 1:
        # coordinate that the shift varies along: rows h (iota must be int)
        var = jax.lax.broadcasted_iota(jnp.int32, (H, WC), 0).astype(jnp.float32)
        pix = jax.lax.broadcasted_iota(jnp.int32, (H, WC), 1) // C  # w index
        unit = C  # one pixel step along lanes spans C elements
        size = W
    else:
        var = (
            jax.lax.broadcasted_iota(jnp.int32, (H, WC), 1) // C
        ).astype(jnp.float32)
        pix = jax.lax.broadcasted_iota(jnp.int32, (H, WC), 0)  # h index
        unit = 1
        size = H

    d = slope * (var - center)  # fractional shift, constant along `axis`
    kf = jnp.floor(d)
    frac = (d - kf).astype(dt)
    kint = kf.astype(jnp.int32)
    g = kint + K  # in [0, 2K]

    n = H if axis == 0 else WC  # pltpu.roll needs non-negative shifts

    def roll(val, s):
        return pltpu.roll(val, s % n, axis)

    cur = roll(img2, K * unit)  # out[i] = x[i - K*unit] start
    nbits = max(int(2 * K).bit_length(), 1)
    for b in range(nbits):
        step = (1 << b) * unit
        rolled = roll(cur, -step)  # out[i] = x[i + step]
        take = ((g >> b) & 1) == 1
        cur = jnp.where(take, rolled, cur)
    t0 = cur
    t1 = roll(cur, -unit)  # one more pixel along the shear axis

    src0 = pix + kint  # integer tap coordinate of t0
    if padding_mode == "border":
        if axis == 1:
            # edge columns tiled across lanes via a tiny selector matmul
            lane = jax.lax.broadcasted_iota(jnp.int32, (C, WC), 1)
            ch = jax.lax.broadcasted_iota(jnp.int32, (C, WC), 0)
            sel = (lane % C == ch).astype(dt)  # (C, WC)
            # MXU accumulators must be 32-bit; cast back after
            lo = jax.lax.dot_general(
                img2[:, 0:C], sel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)
            hi = jax.lax.dot_general(
                img2[:, WC - C:WC], sel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)
        else:
            lo = jnp.broadcast_to(img2[0:1, :], (H, WC))
            hi = jnp.broadcast_to(img2[H - 1:H, :], (H, WC))
        t0 = jnp.where(src0 < 0, lo, jnp.where(src0 > size - 1, hi, t0))
        t1 = jnp.where(src0 + 1 < 0, lo, jnp.where(src0 + 1 > size - 1, hi, t1))
    else:  # zeros
        zero = jnp.zeros_like(img2)
        t0 = jnp.where((src0 < 0) | (src0 > size - 1), zero, t0)
        t1 = jnp.where((src0 + 1 < 0) | (src0 + 1 > size - 1), zero, t1)

    one = jnp.asarray(1.0, dt)
    return (one - frac) * t0 + frac * t1


def _make_kernel(H, W, C, cx, cy, Kx, Ky, padding_mode):
    def kernel(ab_ref, z_ref, out_ref):
        from jax.experimental import pallas as pl

        b = pl.program_id(0)
        alpha = ab_ref[b, 0]
        beta = ab_ref[b, 1]
        # (H, W*C): channels folded into lanes at the XLA level. Mosaic's
        # roll only supports 32-bit data — compute in fp32 in-VMEM; HBM
        # traffic keeps the caller's dtype.
        out_dtype = z_ref.dtype
        img = z_ref[0].astype(jnp.float32)
        img = _shear_kernel_body(
            img, alpha, axis=1, H=H, W=W, C=C, center=cy, K=Kx,
            padding_mode=padding_mode,
        )
        img = _shear_kernel_body(
            img, beta, axis=0, H=H, W=W, C=C, center=cx, K=Ky,
            padding_mode=padding_mode,
        )
        img = _shear_kernel_body(
            img, alpha, axis=1, H=H, W=W, C=C, center=cy, K=Kx,
            padding_mode=padding_mode,
        )
        out_ref[0] = img.astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("cx", "cy", "padding_mode", "interpret")
)
def shear_rotate_residual(
    z: Array,
    r: Array,
    cx: float,
    cy: float,
    padding_mode: str = "border",
    interpret: bool = False,
) -> Array:
    """Rotate each sample by its residual angle r[b] in [-pi/4, pi/4] (radians)
    about (cx, cy), via the 3-shear pallas kernel. Sampling map:
    out(p) = z(Rot(r)(p - c) + c) — the same orientation `_warp_center_affine`
    uses for its sampling rotation."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = z.shape
    alpha = -jnp.tan(r.astype(jnp.float32) / 2.0)
    beta = jnp.sin(r.astype(jnp.float32))
    ab = jnp.stack([alpha, beta], axis=-1)  # (B, 2)
    Kx = _max_shift(_ALPHA_MAX, H, cy)
    Ky = _max_shift(_BETA_MAX, W, cx)
    kernel = _make_kernel(H, W, C, cx, cy, Kx, Ky, padding_mode)
    z2 = z.reshape(B, H, W * C)  # fold channels into lanes (row-major, free)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole (B, 2) scalar table
            pl.BlockSpec((1, H, W * C), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, W * C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W * C), z.dtype),
        interpret=interpret,
    )(ab, z2)
    return out.reshape(B, H, W, C)


def _rot90_centered(x: Array, k: int, cx: int, cy: int, padding_mode: str) -> Array:
    """z(p) = x(Rot90^k (p - c) + c) for integer center c — an exact lattice
    permutation plus a 1-pixel edge-clamped translation when the center is
    not the lattice midpoint (H//2 vs (H-1)/2, the reference's convention
    at continuous_group.py:196)."""
    if k % 4 == 0:
        return x
    k = k % 4
    B, H, W, C = x.shape
    # jnp.rot90(x, k, axes=(1,2)) realizes z(p) = x(Rot90^k (p - m) + m)
    # about the lattice midpoint m = (S-1)/2. The c-centered version is
    # out(p) = z(p + s) with s = Rot90^{-k} d - d, d = c - m (verified by
    # brute force against the explicit gather; tests/test_shear_rotate.py).
    z = jnp.rot90(x, k=k, axes=(1, 2))
    dx, dy = cx - (W - 1) / 2.0, cy - (H - 1) / 2.0
    c, s = [1, 0, -1, 0][k], [0, -1, 0, 1][k]  # cos/sin of -90k degrees
    sx = int(round((c * dx - s * dy) - dx))
    sy = int(round((s * dx + c * dy) - dy))
    if sx == 0 and sy == 0:
        return z
    # out[py, px] = z[py + sy, px + sx], edge-clamped / zero-filled
    pad_mode = "edge" if padding_mode == "border" else "constant"
    ay, ax = abs(sy), abs(sx)
    zp = jnp.pad(z, ((0, 0), (ay, ay), (ax, ax), (0, 0)), mode=pad_mode)
    return zp[:, ay + sy:ay + sy + H, ax + sx:ax + sx + W, :]


def _centered_select_kernel(H, W, shifts, padding_mode):
    """Kernel: out[b] = translate(rot90^{k[b]}(img), sx_k, sy_k) with the
    per-k static shifts folded INTO the exchange/translate matrices (every
    branch stays <=2 single-1-per-row 0/1 matmuls — exact in any dtype).

    translate semantics (matches _rot90_centered): out[y, x] =
    v[y + sy, x + sx], edge-clamped ("border") or zero-filled ("zeros").
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def left_mat(sy, reverse):
        # (L @ v)[i, :] = v[f(i), :] with f(i) = (H-1 - (i+sy)) if reverse
        # else (i + sy); out-of-range -> clamp or zero row
        i = jax.lax.broadcasted_iota(jnp.int32, (H, H), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (H, H), 1)
        src = (H - 1 - (i + sy)) if reverse else (i + sy)
        valid = (src >= 0) & (src <= H - 1)
        srcc = jnp.clip(src, 0, H - 1)
        m = (j == srcc).astype(jnp.float32)
        if padding_mode != "border":
            m = m * valid.astype(jnp.float32)
        return m

    def right_mat(sx, reverse):
        # (v @ R)[:, x] = v[:, g(x)] with g(x) = (W-1 - (x+sx)) if reverse
        # else (x + sx)
        j = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
        x = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
        src = (W - 1 - (x + sx)) if reverse else (x + sx)
        valid = (src >= 0) & (src <= W - 1)
        srcc = jnp.clip(src, 0, W - 1)
        m = (j == srcc).astype(jnp.float32)
        if padding_mode != "border":
            m = m * valid.astype(jnp.float32)
        return m

    def kernel(k_ref, in_ref, out_ref):
        b = pl.program_id(0)
        k = k_ref[b] % 4
        dt = in_ref.dtype
        img = in_ref[0, 0].astype(jnp.float32)
        prec = (
            jax.lax.Precision.DEFAULT
            if dt == jnp.bfloat16
            else jax.lax.Precision.HIGHEST
        )

        def mm(a, bb):
            return jax.lax.dot_general(
                a, bb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )

        # jnp.rot90(img, k): k=1 -> reverse rows of img.T; k=2 -> reverse
        # rows+cols; k=3 -> reverse cols of img.T. Shifts compose on top.
        (sy0, sx0), (sy1, sx1), (sy2, sx2), (sy3, sx3) = shifts

        @pl.when(k == 0)
        def _():
            if (sy0, sx0) == (0, 0):
                out_ref[0, 0] = img.astype(dt)
            else:
                out_ref[0, 0] = mm(
                    mm(left_mat(sy0, False), img), right_mat(sx0, False)
                ).astype(dt)

        @pl.when(k == 1)
        def _():
            out_ref[0, 0] = mm(
                mm(left_mat(sy1, True), img.T), right_mat(sx1, False)
            ).astype(dt)

        @pl.when(k == 2)
        def _():
            out_ref[0, 0] = mm(
                mm(left_mat(sy2, True), img), right_mat(sx2, True)
            ).astype(dt)

        @pl.when(k == 3)
        def _():
            out_ref[0, 0] = mm(
                mm(left_mat(sy3, False), img.T), right_mat(sx3, True)
            ).astype(dt)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("cx", "cy", "padding_mode", "interpret")
)
def pallas_rot90_centered_select(
    x: Array,
    k_idx: Array,
    cx: int,
    cy: int,
    padding_mode: str = "border",
    interpret: bool = False,
) -> Array:
    """Steered single-pass z[b] = rot90_centered^{k[b]}(x[b]) about integer
    center (cx, cy) — replaces the 4-candidate XLA blend in
    `warp_rotate_center_fast` (each candidate materialized a padded/sliced
    copy; here every sample is one read + one write with the center-fix
    translation folded into the in-VMEM permutation matmuls)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = x.shape
    if H != W:
        raise ValueError(
            f"pallas_rot90_centered_select needs square images (the k=1/k=3 "
            f"branches feed img.T through (H,H)/(W,W) permutation matmuls); "
            f"got H={H}, W={W}"
        )
    shifts = []
    for k in range(4):
        if k == 0:
            shifts.append((0, 0))
            continue
        dx, dy = cx - (W - 1) / 2.0, cy - (H - 1) / 2.0
        c, s = [1, 0, -1, 0][k], [0, -1, 0, 1][k]
        sx = int(round((c * dx - s * dy) - dx))
        sy = int(round((s * dx + c * dy) - dy))
        shifts.append((sy, sx))
    kernel = _centered_select_kernel(H, W, tuple(shifts), padding_mode)
    xn = jnp.moveaxis(x, -1, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, C),
        in_specs=[
            pl.BlockSpec((1, 1, H, W), lambda b, c, k_ref: (b, c, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, H, W), lambda b, c, k_ref: (b, c, 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), x.dtype),
        interpret=interpret,
    )(k_idx.astype(jnp.int32), xn)
    return jnp.moveaxis(out, 1, -1)


def warp_rotate_center_fast(
    x: Array,
    R: Array,
    padding_mode: str = "border",
    interpret: bool = False,
) -> Array:
    """Fast-mode equivalent of `_warp_center_affine(x, R, mode)` for pure
    per-sample rotation matrices R (B, 2, 2): sampling src = R^{-1}(dst-c)+c,
    c = (W//2, H//2). Quarter turns resolve to exact permutations; the
    [-45, 45]-degree residual runs through the 3-shear pallas kernel.

    Carries no autodiff rule itself (hard quarter-turn selection + pallas
    kernel). Eval calls it directly; fast-mode TRAINING differentiates
    through it via `ops/warp.warp_center_rotation_fast_diff`'s custom VJP
    (closed-form warp gradients), so changes to this kernel's center or
    padding conventions affect the training path too.
    """
    B, H, W, C = x.shape
    cx, cy = W // 2, H // 2
    # sampling rotation angle: src = Rot(phi)(dst - c) + c with
    # Rot(phi) = R^{-1}; for a rotation matrix R = [[c,-s],[s,c]],
    # phi = -theta where theta = atan2(R[1,0], R[0,0])
    phi = -jnp.arctan2(R[:, 1, 0], R[:, 0, 0]).astype(jnp.float32)
    k = jnp.round(phi / (jnp.pi / 2.0)).astype(jnp.int32)
    r = phi - k.astype(jnp.float32) * (jnp.pi / 2.0)
    k = jnp.mod(k, 4)
    # pallas grids need a concrete batch dim: symbolic-batch export falls
    # back to the blend + dynamic-warp branch (same gate as the discrete
    # select dispatchers, select_warp.py)
    use_pallas = (
        jax.default_backend() == "tpu" and isinstance(B, int)
    ) or interpret
    if use_pallas:
        # steered single-pass quarter turn (one read + one write per
        # sample) instead of the 4-candidate blend of padded copies
        z = pallas_rot90_centered_select(
            x, k, cx, cy, padding_mode, interpret=interpret
        )
    else:
        oh = jax.nn.one_hot(k, 4, dtype=x.dtype)
        z = None
        for j in range(4):
            cand = _rot90_centered(x, j, cx, cy, padding_mode)
            term = cand * oh[:, j][:, None, None, None]
            z = term if z is None else z + term
    if not use_pallas:
        # exact fallback path off-TPU: residual via the dynamic warp
        from equiadapt_tpu.ops.warp import bilinear_sample

        dtype = jnp.promote_types(x.dtype, jnp.float32)
        a = jnp.cos(r).astype(dtype)[:, None, None]
        b = jnp.sin(r).astype(dtype)[:, None, None]
        ys = jnp.arange(H, dtype=dtype)
        xs = jnp.arange(W, dtype=dtype)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        dx = jnp.broadcast_to(gx[None], (B, H, W)) - cx
        dy = jnp.broadcast_to(gy[None], (B, H, W)) - cy
        src_x = a * dx - b * dy + cx
        src_y = b * dx + a * dy + cy
        return bilinear_sample(z, src_x, src_y, padding_mode=padding_mode)
    return shear_rotate_residual(z, r, float(cx), float(cy), padding_mode, interpret)
