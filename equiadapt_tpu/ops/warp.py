"""Image warping ops — the compute core of the image canonicalizers.

TPU-native replacement for the reference's kornia calls
(`K.geometry.rotate` at discrete_group.py:213, `K.geometry.warp_affine` at
continuous_group.py:207, `F.affine_grid`/`F.grid_sample` at
continuous_group.py:400-402). All ops are NHWC (TPU conv layout), pure
functions, jit/vmap/pjit-safe, with per-sample transform parameters.

Key numerics decisions (for functional parity with the reference):

* `rotate` reproduces kornia.geometry.rotate: center ((W-1)/2, (H-1)/2),
  angle in degrees, bilinear, forward map M = rotation about center, sampling
  at src = M^{-1} dst. Positive angle matches kornia/OpenCV's convention.
* The reference's pad(edge, 0.5*W) -> rotate -> center-crop chain
  (discrete_group.py:207-215) is algebraically identical to rotating the
  *unpadded* image with border-clamped ("edge") sampling: the padded image is
  an edge-clamp extension and bilinear taps then interpolate between clamped
  values. We therefore never materialize the 2x-sized padded image — one of
  the main wins over the reference (4x less HBM traffic per warp).
* 90-degree multiples land exactly on integer sample coordinates under the
  (W-1)/2 center convention, so the bilinear path is *exact* for C4/D4 —
  no separate rot90 fast path is needed for correctness.
* `affine_grid_sample` reproduces F.affine_grid + F.grid_sample with
  align_corners=False for the optimized-steerable augmentation path.

Implementation: one flattened gather of the 4 bilinear taps. XLA lowers the
(B, Ho*Wo) row-gather over an (B, H*W, C) operand to dynamic-slice loads with
the channel dim contiguous in lanes — bandwidth-bound, which is the floor for
a resampling op.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

__all__ = [
    "hflip",
    "rotate",
    "rotate_discrete",
    "rotate_twopass",
    "rotate_twopass_from_nchw",
    "rotate_select_fast",
    "warp_affine",
    "warp_center_rotation_fast_diff",
    "affine_grid_sample",
    "bilinear_sample",
    "center_crop",
    "resize",
    "group_angles",
]


def hflip(x: Array) -> Array:
    """Horizontal flip (width axis) of an NHWC image batch."""
    return x[:, :, ::-1, :]


def group_angles(num_rotations: int, dtype=jnp.float32) -> Array:
    """Rotation-angle table: linspace(0, 360, n+1)[:n] in degrees.

    Matches reference discrete_group.py:110-112 — host-side constant.
    """
    return jnp.linspace(0.0, 360.0, num_rotations + 1, dtype=dtype)[:num_rotations]


def _bilinear_sample_slab(
    x: Array, src_x: Array, src_y: Array, padding_mode: str = "zeros"
) -> Array:
    """`bilinear_sample` via two (2·C)-wide slice gathers instead of four
    per-tap row gathers — bit-identical values, ~2x less gather work.

    The 4 bilinear taps of one destination pixel form two x-adjacent pairs
    in consecutive operand rows (y0, x0..x0+1) and (y0+1, x0..x0+1). On the
    flat (B·H·W·C,) view each pair is one contiguous 2·C-float run, so TWO
    `lax.gather` sweeps with slice_sizes=(2·C,) move all four taps with
    half the index count of the four-tap form (TPU gathers are index-rate
    bound, not bandwidth bound — docs/benchmarking.md round-4 cost model).
    The slice start is clipped to x0 <= W-2 / y0 <= H-2 and per-tap {0,1}
    in-slice offsets re-derive the border-clipped tap exactly, with the
    same weights and the same summation order as `bilinear_sample` —
    outputs are bit-identical for both padding modes (asserted in
    tests/test_warp.py and on hardware by bench.py's parity block).
    """
    B, H, W, C = x.shape
    Ho, Wo = src_x.shape[1], src_x.shape[2]
    N = B * Ho * Wo
    cdt = jnp.promote_types(x.dtype, jnp.float32)
    sx = src_x.astype(cdt)
    sy = src_y.astype(cdt)
    # Poison fence: int32(NaN/inf) is POISON in MLIR/LLVM semantics and
    # propagates through jnp.clip (max/min of poison stays poison), so a
    # degenerate coordinate (zero-vector -> NaN rotation on an all-zeros
    # init batch) reaches the PROMISE_IN_BOUNDS gather as a wild index —
    # the likeliest mechanism of the round-4 slab fault (BENCH_r04 rc=1;
    # the taps form survives because jnp.take clamps INSIDE the gather
    # op). Route non-finite coordinates far out of range instead: the
    # weights below still see the original NaN (fx/fy), so outputs stay
    # NaN exactly like the taps form.
    sxf = jnp.where(jnp.isfinite(sx), sx, jnp.asarray(-2.0 * W, cdt))
    syf = jnp.where(jnp.isfinite(sy), sy, jnp.asarray(-2.0 * H, cdt))
    x0 = jnp.floor(sxf)
    y0 = jnp.floor(syf)
    fx = (sx - x0).reshape(N)
    fy = (sy - y0).reshape(N)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    x0c = jnp.clip(x0i, 0, W - 2)
    y0c = jnp.clip(y0i, 0, H - 2)
    # in-slice tap offsets: clip(t0+d, 0, size-1) - t0c, always in {0, 1}
    a0 = (jnp.clip(y0i, 0, H - 1) - y0c).reshape(N)
    a1 = (jnp.clip(y0i + 1, 0, H - 1) - y0c).reshape(N)
    b0 = (jnp.clip(x0i, 0, W - 1) - x0c).reshape(N)
    b1 = (jnp.clip(x0i + 1, 0, W - 1) - x0c).reshape(N)

    xf = x.reshape(B * H * W * C).astype(cdt)
    brow = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None, None]
    # flat start of the 2C-float (2 x-taps x C) run; x0c <= W-2 keeps the
    # run inside its image row
    p00 = (((y0c * W + x0c) + brow) * C).reshape(N)

    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
    )

    def run2c(starts: Array) -> Array:  # (N,) -> (N, 2, C)
        out = jax.lax.gather(
            xf, starts[:, None], dn, slice_sizes=(2 * C,),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
        return out.reshape(N, 2, C)

    top = run2c(p00)            # taps (y0c, x0c), (y0c, x0c+1)
    bot = run2c(p00 + W * C)    # taps (y0c+1, x0c), (y0c+1, x0c+1)

    def pick(a_off: Array, b_off: Array) -> Array:  # -> (N, C)
        rows = jnp.where(a_off[:, None, None] == 0, top, bot)  # (N, 2, C)
        return jnp.where(b_off[:, None] == 0, rows[:, 0], rows[:, 1])

    if padding_mode == "border":
        w00 = (1.0 - fx) * (1.0 - fy)
        w10 = fx * (1.0 - fy)
        w01 = (1.0 - fx) * fy
        w11 = fx * fy
    elif padding_mode == "zeros":
        x0n = x0i.reshape(N)
        y0n = y0i.reshape(N)

        def val(xi, yi):
            return (
                (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
            ).astype(cdt)

        w00 = (1.0 - fx) * (1.0 - fy) * val(x0n, y0n)
        w10 = fx * (1.0 - fy) * val(x0n + 1, y0n)
        w01 = (1.0 - fx) * fy * val(x0n, y0n + 1)
        w11 = fx * fy * val(x0n + 1, y0n + 1)
    else:
        raise ValueError(
            f"padding_mode must be zeros or border, got {padding_mode}"
        )

    out = (
        pick(a0, b0) * w00[:, None]
        + pick(a0, b1) * w10[:, None]
        + pick(a1, b0) * w01[:, None]
        + pick(a1, b1) * w11[:, None]
    )
    return out.reshape(B, Ho, Wo, C).astype(x.dtype)


def bilinear_sample(
    x: Array, src_x: Array, src_y: Array, padding_mode: str = "zeros"
) -> Array:
    """Bilinear sampling of NHWC images at float pixel coordinates.

    Args:
        x: (B, H, W, C) input images.
        src_x, src_y: (B, Ho, Wo) sample coordinates in *pixel* units.
        padding_mode: "zeros" (out-of-bounds taps contribute 0, like
            grid_sample's zeros mode) or "border" (coordinates clamped to the
            edge — equivalent to the reference's edge-pad + crop chain).

    Returns:
        (B, Ho, Wo, C) sampled images.
    """
    from equiadapt_tpu.kernel_options import current_kernel_options

    if (
        x.shape[1] >= 2
        and x.shape[2] >= 2
        and current_kernel_options().bilinear_gather == "slab"
    ):
        # paired-slice gather: bit-identical to the taps form in isolation,
        # half the index traffic — but OPT-IN only: with the round-4 "slab"
        # default the fused continuous-exact canonicalize graph (energy net
        # + this warp) hung/faulted the TPU worker at 256x224px
        # (BENCH_r04.json rc=1; standalone slab runs fine, so the fault
        # needs the fused graph). "taps" is the validated default.
        return _bilinear_sample_slab(x, src_x, src_y, padding_mode)
    B, H, W, C = x.shape
    Ho, Wo = src_x.shape[1], src_x.shape[2]
    compute_dtype = jnp.promote_types(x.dtype, jnp.float32)

    sx = src_x.astype(compute_dtype)
    sy = src_y.astype(compute_dtype)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # single flat (B*H*W, C) row gather with batch-offset global indices:
    # measured ~6% faster than per-sample take_along_axis on the target
    # TPU runtime for the dynamic-angle warps (round-4), same values
    x_flat = x.reshape(B * H * W, C).astype(compute_dtype)
    base = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None]

    def tap(xi: Array, yi: Array, w: Array) -> Array:
        if padding_mode == "border":
            xc = jnp.clip(xi, 0, W - 1)
            yc = jnp.clip(yi, 0, H - 1)
            wt = w
        elif padding_mode == "zeros":
            valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
            xc = jnp.clip(xi, 0, W - 1)
            yc = jnp.clip(yi, 0, H - 1)
            wt = w * valid.astype(compute_dtype)
        else:
            raise ValueError(f"padding_mode must be zeros or border, got {padding_mode}")
        idx = (yc * W + xc).reshape(B, Ho * Wo).astype(jnp.int32) + base
        vals = jnp.take(x_flat, idx.reshape(-1), axis=0)
        return vals.reshape(B, Ho, Wo, C) * wt[..., None]

    out = (
        tap(x0i, y0i, (1.0 - fx) * (1.0 - fy))
        + tap(x0i + 1, y0i, fx * (1.0 - fy))
        + tap(x0i, y0i + 1, (1.0 - fx) * fy)
        + tap(x0i + 1, y0i + 1, fx * fy)
    )
    return out.astype(x.dtype)


def _dst_grid(B: int, Ho: int, Wo: int, dtype) -> Tuple[Array, Array]:
    """Destination pixel-coordinate grids, broadcast to the batch."""
    ys = jnp.arange(Ho, dtype=dtype)
    xs = jnp.arange(Wo, dtype=dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return (
        jnp.broadcast_to(gx[None], (B, Ho, Wo)),
        jnp.broadcast_to(gy[None], (B, Ho, Wo)),
    )


def rotate(
    x: Array,
    angle_deg: Array,
    padding_mode: str = "zeros",
    center: Optional[Tuple[float, float]] = None,
) -> Array:
    """Per-sample rotation, kornia.geometry.rotate semantics.

    dst(xd, yd) = src( a*(xd-cx) - b*(yd-cy) + cx,  b*(xd-cx) + a*(yd-cy) + cy )
    with a = cos(angle), b = sin(angle), center = ((W-1)/2, (H-1)/2).

    Args:
        x: (B, H, W, C).
        angle_deg: (B,) or scalar, degrees (kornia sign convention).
        padding_mode: "zeros" (kornia default) or "border" (see module doc —
            replaces the reference's pad/crop sandwich, discrete_group.py:207-215).
        center: optional (cx, cy) override in pixel units.
    """
    B, H, W, _ = x.shape
    dtype = jnp.promote_types(x.dtype, jnp.float32)
    angle = jnp.broadcast_to(jnp.asarray(angle_deg, dtype), (B,))
    rad = angle * (math.pi / 180.0)
    a = jnp.cos(rad)[:, None, None]
    b = jnp.sin(rad)[:, None, None]
    if center is None:
        cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    else:
        cx, cy = center
    gx, gy = _dst_grid(B, H, W, dtype)
    dx = gx - cx
    dy = gy - cy
    src_x = a * dx - b * dy + cx
    src_y = b * dx + a * dy + cy
    return bilinear_sample(x, src_x, src_y, padding_mode=padding_mode)


@functools.lru_cache(maxsize=256)
def _static_warp_taps(H: int, W: int, angle_deg: float, padding_mode: str):
    """Host-precomputed bilinear taps for a *static* rotation angle.

    Returns (idx (4, H*W) int32, weights (4, H*W) float32) with kornia
    `rotate` semantics — identical numerics to the dynamic path, but the
    indices are trace-time constants, so XLA lowers the sampling to static
    takes instead of per-sample dynamic gathers (which run ~50x slower on
    the target TPU runtime).
    """
    rad = math.radians(angle_deg)
    a, b = math.cos(rad), math.sin(rad)
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    gy, gx = np.meshgrid(np.arange(H, dtype=np.float64),
                         np.arange(W, dtype=np.float64), indexing="ij")
    dx = gx - cx
    dy = gy - cy
    sx = a * dx - b * dy + cx
    sy = b * dx + a * dy + cy
    x0 = np.floor(sx)
    y0 = np.floor(sy)
    fx = (sx - x0).astype(np.float32)
    fy = (sy - y0).astype(np.float32)
    idxs, wts = [], []
    for ddx, ddy, w in (
        (0, 0, (1 - fx) * (1 - fy)),
        (1, 0, fx * (1 - fy)),
        (0, 1, (1 - fx) * fy),
        (1, 1, fx * fy),
    ):
        xi = x0 + ddx
        yi = y0 + ddy
        if padding_mode == "border":
            wt = w
        else:  # zeros
            valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
            wt = w * valid.astype(np.float32)
        xc = np.clip(xi, 0, W - 1).astype(np.int64)
        yc = np.clip(yi, 0, H - 1).astype(np.int64)
        idxs.append((yc * W + xc).reshape(-1).astype(np.int32))
        wts.append(wt.reshape(-1).astype(np.float32))
    return np.stack(idxs), np.stack(wts)


def _static_rotate(x: Array, angle_deg: float, padding_mode: str) -> Array:
    """Rotate the whole batch by one static angle (exact rot90 fast path,
    static-tap bilinear otherwise). Numerically identical to
    `rotate(x, angle_deg, ...)`."""
    B, H, W, C = x.shape
    k = angle_deg / 90.0
    if H == W and abs(k - round(k)) < 1e-9:
        return jnp.rot90(x, k=int(round(k)) % 4, axes=(1, 2))
    idx, wts = _static_warp_taps(H, W, float(angle_deg) % 360.0, padding_mode)
    flat = x.reshape(B, H * W, C)
    out = None
    for t in range(4):
        tap = jnp.take(flat, jnp.asarray(idx[t]), axis=1) * jnp.asarray(wts[t])[None, :, None]
        out = tap if out is None else out + tap
    return out.reshape(B, H, W, C)


def _static_rotate_from_nchw(x: Array, angle_deg: float, padding_mode: str) -> Array:
    """`_static_rotate` for (B, C, H, W) input, emitting NCHW.

    Same static taps, weights, and summation order as the NHWC entry —
    bit-identical values (the gather runs over the flattened H*W axis of
    the NCHW layout instead). Feeds the exact-mode NCHW-spine select."""
    B, C, H, W = x.shape
    k = angle_deg / 90.0
    if H == W and abs(k - round(k)) < 1e-9:
        return jnp.rot90(x, k=int(round(k)) % 4, axes=(2, 3))
    idx, wts = _static_warp_taps(H, W, float(angle_deg) % 360.0, padding_mode)
    flat = x.reshape(B, C, H * W)
    out = None
    for t in range(4):
        tap = jnp.take(flat, jnp.asarray(idx[t]), axis=2) * jnp.asarray(wts[t])[None, None, :]
        out = tap if out is None else out + tap
    return out.reshape(B, C, H, W).astype(x.dtype)


def _twopass_matrices(H: int, W: int, angle_deg: float, padding_mode: str, dtype):
    """Two-pass (row, then column) rotation resampling matrices, built
    on-device from iota (never baked as HLO constants — see
    docs/benchmarking.md on closed-over arrays).

    Pass A interpolates each input *column* w vertically at
    p(y, w) = (b*(w-cx) + (y-cy)) / a + cy; pass B interpolates each output
    row horizontally at q(y, x) = a*(x-cx) - b*(y-cy) + cx, with
    a = cos(angle), b = sin(angle). The composition samples the rotation
    exactly on the two-pass (Catmull-Smith) lattice. Requires |a| bounded
    away from 0 — callers reduce angles to [-45, 45] residuals first.

    Returns:
        M1 (H, H, W): contribution of in[h, w] to V[y, w].
        M2 (H, W, W): contribution of V[y, w] to out[y, x].
    """
    rad = math.radians(angle_deg)
    a, b = math.cos(rad), math.sin(rad)
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    yv = jnp.arange(H, dtype=jnp.float32)
    wv = jnp.arange(W, dtype=jnp.float32)
    xv = jnp.arange(W, dtype=jnp.float32)

    def taps(pos, size):
        lo = jnp.floor(pos)
        f = pos - lo
        if padding_mode == "border":
            w0, w1 = 1.0 - f, f
        else:  # zeros
            v0 = (lo >= 0) & (lo <= size - 1)
            v1 = (lo + 1 >= 0) & (lo + 1 <= size - 1)
            w0 = (1.0 - f) * v0.astype(jnp.float32)
            w1 = f * v1.astype(jnp.float32)
        i0 = jnp.clip(lo, 0, size - 1).astype(jnp.int32)
        i1 = jnp.clip(lo + 1, 0, size - 1).astype(jnp.int32)
        return i0, i1, w0, w1

    p = (b * (wv[None, :] - cx) + (yv[:, None] - cy)) / a + cy  # (y, w)
    h0, h1, u0, u1 = taps(p, H)
    hh = jnp.arange(H, dtype=jnp.int32)
    M1 = ((hh[None, :, None] == h0[:, None, :]) * u0[:, None, :]
          + (hh[None, :, None] == h1[:, None, :]) * u1[:, None, :]).astype(dtype)

    q = a * (xv[None, :] - cx) - b * (yv[:, None] - cy) + cx  # (y, x)
    w0i, w1i, g0, g1 = taps(q, W)
    ww = jnp.arange(W, dtype=jnp.int32)
    M2 = ((ww[None, :, None] == w0i[:, None, :]) * g0[:, None, :]
          + (ww[None, :, None] == w1i[:, None, :]) * g1[:, None, :]).astype(dtype)
    return M1, M2


def rotate_twopass_nchw(
    x: Array, angle_deg: float, padding_mode: str = "border"
) -> Array:
    """`rotate_twopass` emitting (B, C, H, W) directly: the layout change
    rides the second GEMM's output epilogue instead of a separate transpose
    (feeds the NCHW pallas select kernel, ops/pallas/select_warp.py)."""
    B, H, W, C = x.shape
    ang = float(angle_deg) % 360.0
    k = int(round(ang / 90.0))
    r = ang - 90.0 * k  # [-45, 45]
    k %= 4
    if H != W:
        raise ValueError("rotate_twopass_nchw requires square images")
    if abs(r) < 1e-9:
        out = jnp.rot90(x, k=k, axes=(1, 2)) if k else x
        return jnp.moveaxis(out, -1, 1)
    dt = x.dtype
    M1, M2 = _twopass_matrices(H, W, r, padding_mode, dt)
    # (y, w, b, c) intermediate: pass-1's natural output layout feeds
    # pass-2's operand DMA without the V relayout copy XLA inserts for the
    # (b, y, w, c) ordering (round-4 measurement: -0.2 ms at 224px/256 in
    # the select chain; identical reduction order, so outputs are
    # bit-identical to the previous form)
    V = jnp.einsum("yhw,bhwc->ywbc", M1, x, preferred_element_type=jnp.float32)
    out = jnp.einsum(
        "ywx,ywbc->bcyx", M2, V.astype(dt), preferred_element_type=jnp.float32
    ).astype(dt)
    return jnp.rot90(out, k=k, axes=(2, 3)) if k else out


def rotate_twopass_from_nchw(
    x: Array, angle_deg: float, padding_mode: str = "border"
) -> Array:
    """`rotate_twopass_nchw` for an (B, C, H, W) input: NCHW in, NCHW out.

    Used by the NCHW-spine serving path (discrete_group.py), where the
    batch is cast+transposed once and every warp consumer reads the NCHW
    tensor — the einsums contract over the same axes in the same order as
    the NHWC-in variant, so the outputs are bit-identical (asserted on
    hardware by the bench's kernel-equality block).
    """
    B, C, H, W = x.shape
    ang = float(angle_deg) % 360.0
    k = int(round(ang / 90.0))
    r = ang - 90.0 * k  # [-45, 45]
    k %= 4
    if H != W:
        raise ValueError("rotate_twopass_from_nchw requires square images")
    if abs(r) < 1e-9:
        return jnp.rot90(x, k=k, axes=(2, 3)) if k else x
    dt = x.dtype
    M1, M2 = _twopass_matrices(H, W, r, padding_mode, dt)
    V = jnp.einsum("yhw,bchw->bcyw", M1, x, preferred_element_type=jnp.float32)
    out = jnp.einsum(
        "ywx,bcyw->bcyx", M2, V.astype(dt), preferred_element_type=jnp.float32
    ).astype(dt)
    return jnp.rot90(out, k=k, axes=(2, 3)) if k else out


def rotate_twopass(x: Array, angle_deg: float, padding_mode: str = "border") -> Array:
    """Whole-batch rotation by a *static* angle as two batched MXU GEMMs.

    The fast-mode counterpart of `_static_rotate`: instead of 4-tap gathers
    (which run far below HBM bandwidth on TPU), the resampling is expressed
    as one vertical and one horizontal 1-D interpolation, each a batched
    matmul over the row/column axis — MXU work at full tilt. Exact for
    90-degree multiples (pure rot90); for other angles the two-pass lattice
    differs from direct 4-tap bilinear by a small interpolation residual
    (high-frequency content only; see tests/test_fast_warp.py for bounds).

    Angles are reduced to a [-45, 45] residual composed with rot90s, so the
    pass conditioning (1/cos) never exceeds sqrt(2).
    """
    B, H, W, C = x.shape
    ang = float(angle_deg) % 360.0
    k = int(round(ang / 90.0))
    r = ang - 90.0 * k  # [-45, 45]
    k %= 4
    if abs(r) < 1e-9:
        return jnp.rot90(x, k=k, axes=(1, 2)) if k else x
    if H != W:
        raise ValueError("rotate_twopass requires square images")
    dt = x.dtype
    M1, M2 = _twopass_matrices(H, W, r, padding_mode, dt)
    V = jnp.einsum("yhw,bhwc->bywc", M1, x, preferred_element_type=jnp.float32)
    out = jnp.einsum(
        "ywx,bywc->byxc", M2, V.astype(dt), preferred_element_type=jnp.float32
    ).astype(dt)
    return jnp.rot90(out, k=k, axes=(1, 2)) if k else out


def _residual_rotate(x: Array, angle_deg: float, padding_mode: str, mode: str) -> Array:
    """Static-angle whole-batch rotate: exact 4-tap or fast two-pass."""
    if mode == "fast":
        return rotate_twopass(x, angle_deg, padding_mode)
    return _static_rotate(x, angle_deg, padding_mode)


def rotate_select_fast(
    x: Array,
    idx: Array,
    num_rotations: int,
    sign: float = -1.0,
    padding_mode: str = "border",
) -> Array:
    """Hard per-sample discrete-rotation select, fast mode (pure XLA).

    out[b] = rotate(x[b], sign * theta_{idx[b]}) with each distinct mod-90
    residual materialized once via `rotate_twopass` and the 90-degree part
    applied as an exact rot90 one-hot blend (layout permutations — rot90
    candidates are bit-exact, so elements at 90-degree multiples match the
    exact path bit-for-bit). No gathers, no NCHW transposes: profiled faster
    than the pallas NCHW select kernel on the target runtime
    (docs/benchmarking.md round-2 notes).
    """
    if x.shape[1] != x.shape[2]:
        onehot = jax.nn.one_hot(idx, num_rotations, dtype=x.dtype)
        return rotate_discrete(x, onehot, num_rotations, sign, padding_mode)
    angles = np.linspace(0.0, 360.0, num_rotations + 1)[:num_rotations]
    # residual/quarter-turn decomposition per group element
    residuals, res_of_g, k_of_g = [], [], []
    for g in range(num_rotations):
        ang = (sign * float(angles[g])) % 360.0
        r = ang % 90.0
        k = int(round((ang - r) / 90.0)) % 4
        if r not in residuals:
            residuals.append(r)
        res_of_g.append(residuals.index(r))
        k_of_g.append(k)
    cands = [
        x if r == 0.0 else rotate_twopass(x, r, padding_mode) for r in residuals
    ]
    if len(cands) == 1:
        z = cands[0]
    else:
        res_idx = jnp.asarray(res_of_g, jnp.int32)[idx]
        oh_r = jax.nn.one_hot(res_idx, len(cands), dtype=x.dtype)
        z = sum(c * oh_r[:, i][:, None, None, None] for i, c in enumerate(cands))
    # quarter turns as a 2-stage (rot90 then rot180) blend: 2 two-candidate
    # blends move less HBM than one 4-candidate blend (rot180 is a pure
    # reversal that fuses into its consumer), bit-identical output
    k_idx = jnp.asarray(k_of_g, jnp.int32)[idx]
    k0 = (k_idx % 2).astype(x.dtype)[:, None, None, None]
    k1 = (k_idx // 2).astype(x.dtype)[:, None, None, None]
    w = (1.0 - k0) * z + k0 * jnp.rot90(z, k=1, axes=(1, 2))
    return (1.0 - k1) * w + k1 * jnp.rot90(w, k=2, axes=(1, 2))


def rotate_discrete(
    x: Array,
    onehot: Array,
    num_rotations: int,
    sign: float = -1.0,
    padding_mode: str = "zeros",
    mode: str = "exact",
) -> Array:
    """Per-sample rotation over a *discrete* angle set, as a one-hot blend
    of static warps:  out[b] = sum_g onehot[b, g] * rotate(x[b], sign * theta_g).

    Forward numerics are identical to `rotate(x, sign * theta_sel)` — each
    branch uses the same bilinear taps, just with trace-time-constant
    indices — but runs ~15-60x faster on the target TPU, where dynamic
    gathers are pathologically slow (see bench.py notes). The gradient
    w.r.t. the (straight-through) one-hot flows through the blend weights —
    the exact gradient of the discrete mixture (the reference instead
    differentiates the sample coordinates through the angle; both are valid
    straight-through estimators).

    Candidates sharing a mod-90 residual are factored through one static
    warp:  R(r + 90k) = rot90^k . R(r)  (square images), so a C8 blend
    costs one 45-degree 4-tap warp plus seven layout rotations instead of
    four separate warps.

    Args:
        x: (B, H, W, C).
        onehot: (B, num_rotations) selection (may carry straight-through
            gradients); columns correspond to group_angles(num_rotations).
        sign: -1 for canonicalize (undo the pose), +1 for invert.
        mode: "exact" (4-tap static gathers, torch-parity numerics) or
            "fast" (two-pass MXU residual warps, rotate_twopass).
    """
    angles = np.linspace(0.0, 360.0, num_rotations + 1)[:num_rotations]
    square = x.shape[1] == x.shape[2]
    # group candidates by residual angle mod 90 (square images only)
    warped_cache: dict = {}
    out = None
    for g in range(num_rotations):
        ang = (sign * float(angles[g])) % 360.0
        if square:
            residual = ang % 90.0
            k = int(round((ang - residual) / 90.0)) % 4
            if residual not in warped_cache:
                warped_cache[residual] = (
                    x
                    if residual == 0.0
                    else _residual_rotate(x, residual, padding_mode, mode)
                )
            cand = jnp.rot90(warped_cache[residual], k=k, axes=(1, 2))
        else:
            cand = _static_rotate(x, ang, padding_mode)
        term = cand * onehot[:, g][:, None, None, None]
        out = term if out is None else out + term
    return out


def warp_affine(
    x: Array,
    affine: Array,
    dsize: Optional[Tuple[int, int]] = None,
    padding_mode: str = "zeros",
) -> Array:
    """Per-sample affine warp, kornia.geometry.warp_affine semantics.

    `affine` is the 2x3 *forward* map in pixel coordinates (src -> dst, as
    built by the reference at continuous_group.py:195-204); sampling inverts
    it: src = A^{-1}(dst - t).

    Args:
        x: (B, H, W, C).
        affine: (B, 2, 3) forward affine matrices [R | t] with rows (x, y).
        dsize: output (H, W); defaults to input size.
        padding_mode: "zeros" or "border".
    """
    B, H, W, _ = x.shape
    Ho, Wo = dsize if dsize is not None else (H, W)
    dtype = jnp.promote_types(x.dtype, jnp.float32)
    A = affine.astype(dtype)
    r00, r01, t0 = A[:, 0, 0], A[:, 0, 1], A[:, 0, 2]
    r10, r11, t1 = A[:, 1, 0], A[:, 1, 1], A[:, 1, 2]
    det = r00 * r11 - r01 * r10
    inv_det = 1.0 / det
    i00 = r11 * inv_det
    i01 = -r01 * inv_det
    i10 = -r10 * inv_det
    i11 = r00 * inv_det

    gx, gy = _dst_grid(B, Ho, Wo, dtype)
    ux = gx - t0[:, None, None]
    uy = gy - t1[:, None, None]
    src_x = i00[:, None, None] * ux + i01[:, None, None] * uy
    src_y = i10[:, None, None] * ux + i11[:, None, None] * uy
    return bilinear_sample(x, src_x, src_y, padding_mode=padding_mode)


def affine_grid_sample(
    x: Array, theta: Array, padding_mode: str = "zeros"
) -> Array:
    """F.affine_grid + F.grid_sample (align_corners=False) equivalent.

    `theta` (B, 2, 3) maps *output* normalized coords to *input* normalized
    coords (torch convention; reference continuous_group.py:400-402). With
    align_corners=False a normalized coordinate g maps to pixel
    ((g + 1) * size - 1) / 2.

    Args:
        x: (B, H, W, C).
        theta: (B, 2, 3).
    """
    B, H, W, _ = x.shape
    dtype = jnp.promote_types(x.dtype, jnp.float32)
    th = theta.astype(dtype)
    gx, gy = _dst_grid(B, H, W, dtype)
    # output pixel -> output normalized (align_corners=False)
    nx = (2.0 * gx + 1.0) / W - 1.0
    ny = (2.0 * gy + 1.0) / H - 1.0
    sx_n = th[:, 0, 0, None, None] * nx + th[:, 0, 1, None, None] * ny + th[:, 0, 2, None, None]
    sy_n = th[:, 1, 0, None, None] * nx + th[:, 1, 1, None, None] * ny + th[:, 1, 2, None, None]
    # input normalized -> input pixel (align_corners=False)
    src_x = ((sx_n + 1.0) * W - 1.0) / 2.0
    src_y = ((sy_n + 1.0) * H - 1.0) / 2.0
    return bilinear_sample(x, src_x, src_y, padding_mode=padding_mode)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fast_diff_warp(x: Array, R: Array, padding_mode: str) -> Array:
    from equiadapt_tpu.ops.pallas.shear_rotate import warp_rotate_center_fast

    return warp_rotate_center_fast(x, R, padding_mode)


def _fast_diff_warp_fwd(x: Array, R: Array, padding_mode: str):
    out = _fast_diff_warp(x, R, padding_mode)
    return out, (R, out)


def _fast_diff_warp_bwd(padding_mode: str, res, g: Array):
    R, out = res
    B, H, W, C = out.shape
    cx, cy = W // 2, H // 2  # kernel center convention (shear_rotate.py)
    dt = jnp.promote_types(out.dtype, jnp.float32)
    gf = g.astype(dt)
    outf = out.astype(dt)

    # spatial gradients of the forward output (central differences —
    # O(h^2)-accurate estimate of the resampled image's derivative; the
    # reference's bilinear autodiff uses the raw tap differences, an
    # equally-biased piecewise-constant estimator)
    d_dy = jnp.gradient(outf, axis=1)
    d_dx = jnp.gradient(outf, axis=2)

    Rm = R.astype(dt)
    det = Rm[:, 0, 0] * Rm[:, 1, 1] - Rm[:, 0, 1] * Rm[:, 1, 0]
    i00 = Rm[:, 1, 1] / det
    i01 = -Rm[:, 0, 1] / det
    i10 = -Rm[:, 1, 0] / det
    i11 = Rm[:, 0, 0] / det

    ys = jnp.arange(H, dtype=dt)
    xs = jnp.arange(W, dtype=dt)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    dx = gx - cx
    dy = gy - cy
    u1 = i00[:, None, None] * dx + i01[:, None, None] * dy  # (B, H, W)
    u2 = i10[:, None, None] * dx + i11[:, None, None] * dy

    gdx = jnp.sum(gf * d_dx, axis=-1)  # channel-summed (B, H, W)
    gdy = jnp.sum(gf * d_dy, axis=-1)
    # Rbar[i, j] = -sum_p g(p) * (grad out)_i(p) * u_j(p)
    Rbar = -jnp.stack(
        [
            jnp.stack(
                [jnp.sum(gdx * u1, (1, 2)), jnp.sum(gdx * u2, (1, 2))], axis=-1
            ),
            jnp.stack(
                [jnp.sum(gdy * u1, (1, 2)), jnp.sum(gdy * u2, (1, 2))], axis=-1
            ),
        ],
        axis=-2,
    ).astype(R.dtype)

    # input cotangent: the adjoint of bilinear sampling is the bilinear
    # splat with the same taps; for (near-)orthonormal R it is approximated
    # by the inverse warp of the cotangent (sample ~ splat), which reuses
    # the same fast kernel
    Rinv = jnp.stack(
        [jnp.stack([i00, i01], -1), jnp.stack([i10, i11], -1)], axis=-2
    ).astype(R.dtype)
    from equiadapt_tpu.ops.pallas.shear_rotate import warp_rotate_center_fast

    xbar = warp_rotate_center_fast(g, Rinv, "zeros")
    return xbar, Rbar


_fast_diff_warp.defvjp(_fast_diff_warp_fwd, _fast_diff_warp_bwd)


def warp_center_rotation_fast_diff(
    x: Array, R: Array, padding_mode: str = "border"
) -> Array:
    """Differentiable fast-mode centered rotation warp.

    Forward: the eval-mode fast kernel (`warp_rotate_center_fast`, 3-shear
    pallas on TPU) — per-sample rotation matrices, no dynamic gathers.
    Backward: closed-form warp gradients instead of autodiff through the
    kernel. For out(p) = x(R^{-1}(p - c) + c):

        d out / d R_ij (p) = -(grad out(p))_i * u_j(p),  u = R^{-1}(p - c)

    (chain rule through the sampling map; grad out estimated by central
    differences of the forward output), and the input cotangent is the
    inverse warp of the output cotangent (the sample~splat approximation of
    the bilinear adjoint, exact up to interpolation error for rotations).

    This gives steerable/optimized-steerable *training* the fast-kernel
    cost profile — the reference path it replaces is the kornia
    warp_affine autodiff (continuous_group.py:207), which our exact mode
    reproduces at ~68x the step cost on TPU (BENCH_r02 693 ms vs ~10 ms).
    Gradient-quality bounds vs the exact warp are asserted in
    tests/test_fast_warp.py.
    """
    return _fast_diff_warp(x, R, padding_mode)


def center_crop(x: Array, size: Tuple[int, int]) -> Array:
    """torchvision CenterCrop semantics on NHWC (crop_top = round((H-h)/2))."""
    H, W = x.shape[1], x.shape[2]
    h, w = size
    top = int(round((H - h) / 2.0))
    left = int(round((W - w) / 2.0))
    return x[:, top : top + h, left : left + w, :]


def resize(x: Array, size: Tuple[int, int], method: str = "linear") -> Array:
    """Bilinear resize (half-pixel convention, no antialias) on NHWC.

    Replaces torchvision transforms.Resize for the pre-canonicalization
    downscale (reference discrete_group.py:88-92). jax.image.resize's
    "linear" uses the half-pixel-centers convention (align_corners=False).
    """
    B, _, _, C = x.shape
    return jax.image.resize(x, (B, size[0], size[1], C), method=method)
