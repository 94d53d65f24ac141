"""Pallas TPU kernel: EXACT per-sample bilinear rotation warp.

The continuous canonicalizers' exact/parity mode (reference
continuous_group.py:191-208, kornia warp_affine = direct 4-tap bilinear
grid_sample) warps every image by an arbitrary per-sample rotation. At the
XLA level that is a dynamic-coordinate gather — the pathological op class on
this runtime (~650 ms per canonicalize step at 224px/batch 256, BENCH_r03).
The fast 3-shear kernel (ops/pallas/shear_rotate.py) is ~100x quicker but
carries a small interpolation residual, so it cannot serve the parity mode.

This kernel computes the *direct 4-tap bilinear* warp — the same taps, the
same clamp/validity weights as ops/warp.bilinear_sample — with the gather
restructured as MXU work:

  * The destination image is tiled into (RB x TW) blocks. Within a block the
    source coordinates of a rotation span at most TW + RB consecutive rows
    and columns (|R^{-1}| entries <= 1), so one dynamic SUBLANE slice loads
    the whole source row band the block can touch into registers.
  * Vertical interpolation of both y-taps is ONE matmul: a (P, BAND) matrix
    carrying (1-fy, fy) at lane (y0 - band_start, y0+1 - band_start) per
    destination pixel p, contracted with the (BAND, W*C) band. Weighted
    one-hot matmuls are exact: each output element is a 2-term dot.
  * Horizontal interpolation is a masked lane compare (lane//C == x-tap)
    times the vertically-interpolated rows, reduced through a constant
    (W*C, C) channel-selector matmul.

Numerics: identical tap coordinates, weights, and clamp/zeros semantics as
`ops/warp._warp_center_affine` -> `bilinear_sample` (asserted in
tests/test_bilinear_warp.py); the only difference is fp32 summation order
(vertical pair first), ~1 ulp. Out-of-range taps stay inside the loaded
band: if any tap clamps low (y0 < 0) the band starts at row 0, if any clamps
high it ends at H-1, and in-range taps span < BAND rows by construction.

Eval-only: like `warp_rotate_center_fast`, the kernel carries no autodiff
rule. The exact TRAINING path keeps the XLA dynamic-gather warp (gradients
w.r.t. the rotation flow through the sample coordinates, reference parity).
Dispatch lives in images/canonicalization/continuous_group.py behind
KernelOptions.exact_warp ("pallas" default for TPU eval).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

__all__ = ["warp_rotate_center_exact", "exact_warp_tiling"]

# HIGHEST (~fp32 via bf16 passes): every kernel matmul is a weighted
# one-/two-hot contraction, so each output element is a <=2-term dot —
# measured 9.5e-7 max deviation vs the XLA taps form on hardware. DEFAULT
# (single bf16 pass) measured 2.4e-2 — outside the 1e-5 parity budget —
# and mosaic does not lower Precision.HIGH, so HIGHEST it is; the lane
# window (below) keeps the extra passes cheap.
_PRECISION = jax.lax.Precision.HIGHEST
# Round-5 hardware A/B (.scratch stage_g, 224px/batch 256): a manual
# 3-limb 4-pass bf16 vertical matmul ties HIGHEST exactly (127.6 vs
# 127.5 ms) at 36x worse parity (2.6e-5 vs 7.2e-7) — the kernel is NOT
# MXU-bound, so HIGHEST's extra passes are free and precision stays.


def _vmatmul(vy, band):
    """Vertical pair-interpolation contraction (P, BAND) @ (BAND, WC)."""
    return jax.lax.dot_general(
        vy, band, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_PRECISION,
    )
# Lane window (dynamic roll + crop of the band before the matmul): cuts
# matmul MACs 672->384 lanes at 224px/C3, but the measured cost of the
# dynamic lane rotate + concat relayouts (~2.4us/tile) EXCEEDS the matmul
# savings on v5e — net +16 ms at the bench shape (round-5 ablation:
# windowed 168.6 ms vs full-width 152.3 ms). Kept for wider-image shapes
# where the ratio flips; off by default.
_ENABLE_WINDOW = False


def _largest_divisor_leq(n: int, cap: int) -> int:
    for d in range(min(n, cap), 0, -1):
        if n % d == 0:
            return d
    return 1


def exact_warp_tiling(H: int, W: int) -> Optional[Tuple[int, int, int]]:
    """(RB, TW, BAND) destination tile + source band height for an (H, W)
    image, or None when no efficient tiling exists (degenerate sizes).

    TW ~ 16 keeps the band (and with it the matmul contraction) small —
    total MXU FLOPs scale with BAND = TW + RB + margin, not with the tile
    area — while RB fills the sublane dimension (P = RB*TW ~ 512).

    Round-5 hardware A/B at 224px/batch 256 (fori-amortized, .scratch
    stage_f): (RB=32, TW=16) 126.8 ms beats (16, 32) 167.0, (8, 32)
    170.1, and (32, 32) VMEM-OOMs at 24.5M/16M — same per-pass FLOP
    accounting, so the grid-step count (B * H/RB) dominates: fewer, taller
    row tiles win. Keep TW at 16.
    """
    if H < 2 or W < 2:
        return None
    TW = _largest_divisor_leq(W, 16)
    if TW < 8:  # tiny divisors => degenerate matmuls; widen the tile
        TW = _largest_divisor_leq(W, 128)
    RB = _largest_divisor_leq(H, max(1, 512 // TW))
    P = RB * TW
    if P < 8 or P > 4096:
        return None
    # +12 margin: +4 tap/floor slack, +8 because the band start is floored
    # to a sublane-tile (8-row) boundary for the dynamic slice. When H is
    # not itself 8-aligned the floored start cannot reach the bottom rows,
    # so the band covers the full height (no slice).
    band = min(H, ((TW + RB + 12 + 7) // 8) * 8)
    if H % 8 != 0:
        band = H
    return RB, TW, band


def _make_kernel(H, W, C, RB, TW, BAND, cx, cy, padding_mode, out_dtype):
    P = RB * TW
    WC = W * C
    n_ct = W // TW
    # lane window: the x-taps of one tile span <= TW + RB columns, so the
    # band is rotated (dynamic lane roll, channel-phase preserved since the
    # base is a multiple of C) and statically cropped to WIN lanes before
    # the matmul — cutting both MXU contraction width and all mask-building
    # VPU work by WC/WIN. WIN is a multiple of lcm(128, C): lane-tile
    # aligned AND channel-divisible, so the halving tree stays exact.
    lcm = 128 * C // math.gcd(128, C)
    need = (TW + RB + 6) * C
    WIN = ((need + lcm - 1) // lcm) * lcm
    if WIN >= WC or not _ENABLE_WINDOW:
        WIN = None

    def kernel(tab_ref, img_ref, out_ref):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        b = pl.program_id(0)
        rt = pl.program_id(1)
        i00 = tab_ref[b, 0]
        i01 = tab_ref[b, 1]
        i10 = tab_ref[b, 2]
        i11 = tab_ref[b, 3]

        # --- ct-independent values, hoisted out of the column-tile loop ---
        # destination pixel coords, COLUMN-major within the (RB, TW) tile
        # (p = w*RB + r): halving the pixel axis then pairs equal dest
        # rows, so the final (P, TW*C) -> (RB, TW*C) placement is a
        # log2(TW) tree of sublane adds instead of a matmul
        pidx = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        gy = (rt * RB + pidx % RB).astype(jnp.float32)
        gxw = (pidx // RB).astype(jnp.float32)  # in-tile column, gx - ct*TW
        dy = gy - cy
        hiof = jax.lax.broadcasted_iota(  # band row index, as fp32
            jnp.int32, (P, BAND), 1
        ).astype(jnp.float32)
        lxf = (  # lane -> source pixel column, as fp32
            jax.lax.broadcasted_iota(jnp.int32, (P, (WIN or WC)), 1) // C
        ).astype(jnp.float32)
        ljmask = (  # output placement: pixel (w, r) owns lane slot w
            jax.lax.broadcasted_iota(jnp.int32, (P, TW * C), 1) // C
            == pidx // RB
        ).astype(jnp.float32)
        fdy0 = jnp.float32(rt * RB) - cy
        fdy1 = fdy0 + (RB - 1)

        # column tiles are an in-kernel static loop (the mosaic block-shape
        # contract wants full-lane-width output blocks)
        for ct in range(n_ct):
            # (P, 1) source coords: the SAME fp evaluation order as
            # ops/warp._warp_center_affine (not reassociated through a
            # ct-hoisted base — a 1-ulp coordinate drift at >128px shifts
            # tap weights by ~1.4e-5, past the parity budget)
            gx = jnp.float32(ct * TW) + gxw
            dx = gx - cx
            sx = i00 * dx + i01 * dy + cx
            sy = i10 * dx + i11 * dy + cy

            # band start: floor of the minimum source y over the tile
            # corners (sy is affine in the dest coords -> corners bound it)
            fdx0 = jnp.float32(ct * TW) - cx
            fdx1 = fdx0 + (TW - 1)
            corners = jnp.minimum(
                jnp.minimum(i10 * fdx0 + i11 * fdy0, i10 * fdx0 + i11 * fdy1),
                jnp.minimum(i10 * fdx1 + i11 * fdy0, i10 * fdx1 + i11 * fdy1),
            ) + cy
            # DMA-safety guard: a non-finite coefficient table (e.g. the
            # degenerate zero-vector -> NaN rotation a steerable net emits
            # on an all-zeros init batch) must NOT reach the dynamic slice
            # start — int32(NaN/inf) is undefined and an out-of-bounds
            # sublane DMA hangs the TPU worker (round-5 incident). The
            # clip below bounds finite garbage; this bounds NaN/inf. Tap
            # WEIGHTS keep the NaN (sy/sx untouched), so outputs stay NaN
            # like the XLA gather path — only the address math is fenced.
            corners = jnp.where(
                jnp.isfinite(corners), corners, jnp.float32(0.0)
            )
            y0min = jnp.floor(corners).astype(jnp.int32)
            if BAND == H:
                ystart = 0
                band = img_ref[0].astype(jnp.float32)
            else:
                # sublane-tile-aligned dynamic slice start (mosaic contract)
                ystart = pl.multiple_of(
                    (jnp.clip(y0min, 0, H - BAND) // 8) * 8, 8
                )
                band = img_ref[0, pl.ds(ystart, BAND), :].astype(jnp.float32)

            if WIN is not None:
                # x-window base: floor of the min source x over the corners
                xcorners = jnp.minimum(
                    jnp.minimum(
                        i00 * fdx0 + i01 * fdy0, i00 * fdx0 + i01 * fdy1
                    ),
                    jnp.minimum(
                        i00 * fdx1 + i01 * fdy0, i00 * fdx1 + i01 * fdy1
                    ),
                ) + cx
                xcorners = jnp.where(
                    jnp.isfinite(xcorners), xcorners, jnp.float32(0.0)
                )  # same DMA-safety fence as the y band start
                xbase_px = jnp.clip(
                    jnp.floor(xcorners).astype(jnp.int32), 0, W - WIN // C
                )
                # dynamic lane rotate needs a lane-tile-aligned width: pad
                # to the next multiple of 128. The window never reads the
                # pad: xbase <= WC - WIN, l < WIN => l + xbase < WC, and
                # the left rotation by xbase never wraps those lanes.
                WCP = ((WC + 127) // 128) * 128
                if WCP != WC:
                    band = jnp.concatenate(
                        [band, jnp.zeros((BAND, WCP - WC), band.dtype)],
                        axis=1,
                    )
                band = pltpu.roll(
                    band, (WCP - xbase_px * C) % WCP, 1
                )[:, :WIN]
                WW = WIN // C
            else:
                xbase_px = 0
                WW = W

            # Bilinear 2-tap weights at integer position i are the hat
            # function hat(s - i) = max(0, 1 - |s - i|): for in-range s
            # this yields EXACTLY the taps-form (1-f, f) pair (s - floor(s)
            # and 1 - f are both exact fp32 subtractions), and clamping s
            # first reproduces border mode's fold-the-taps-onto-the-edge
            # weight sum (a clamped pair sums to hat(0) = 1). zeros mode
            # needs no clamp: out-of-range taps simply have no lane/row.
            one = jnp.float32(1.0)
            if padding_mode == "border":
                syc = jnp.clip(sy, 0.0, float(H - 1))
                sxc = jnp.clip(sx, 0.0, float(W - 1))
            else:
                syc = sy
                sxc = sx

            # vertical pair-interpolation matmul: (P, BAND) @ (BAND, W*C)
            vy = jnp.maximum(
                0.0, one - jnp.abs((syc - ystart) - hiof)
            )
            c2 = _vmatmul(vy, band)  # (P, W*C): both-y-interpolated rows

            # horizontal 2-tap: hat weights per lane, then a lane-halving
            # tree to sum each pixel's row down to its C channel values
            hx = jnp.maximum(
                0.0, one - jnp.abs((sxc - xbase_px) - lxf[:, : WW * C])
            )
            m = hx * c2
            wcur = WW
            while wcur % 2 == 0 and wcur > 1:
                wcur //= 2
                m = m[:, : wcur * C] + m[:, wcur * C : 2 * wcur * C]
            d = m[:, 0:C]
            for k in range(1, wcur):
                d = d + m[:, k * C : (k + 1) * C]
            # d (P, C) -> output tile (RB, TW*C). Mosaic cannot reshape
            # sublanes into lanes, so place exactly without matmuls: tile
            # the C channel lanes across the TW lane slots, mask each pixel
            # to its own slot (single nonzero per output element), then
            # collapse the column-major pixel axis onto RB rows by sublane
            # halving — each halving adds pixel (w, r) to (w + P/2/RB, r),
            # preserving the dest row r.
            bm = pltpu.repeat(d, TW, axis=1)  # (P, TW*C): d[p, lane % C]
            bm = bm * ljmask
            rows = P
            while rows > RB and (rows // RB) % 2 == 0:
                rows //= 2
                bm = bm[:rows] + bm[rows : 2 * rows]
            if rows > RB:  # odd leftover factor of TW
                acc = bm[0:RB]
                for k in range(1, rows // RB):
                    acc = acc + bm[k * RB : (k + 1) * RB]
                bm = acc
            out_ref[0, :, ct * TW * C:(ct + 1) * TW * C] = bm.astype(
                out_dtype
            )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("padding_mode", "interpret")
)
def _warp_exact_call(
    x: Array, tab: Array, padding_mode: str, interpret: bool
) -> Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = x.shape
    RB, TW, BAND = exact_warp_tiling(H, W)
    cx, cy = H // 2, W // 2  # reference convention: shape[-2]//2, shape[-1]//2
    kernel = _make_kernel(
        H, W, C, RB, TW, BAND, float(cx), float(cy), padding_mode, x.dtype
    )
    x2 = x.reshape(B, H, W * C)
    out = pl.pallas_call(
        kernel,
        grid=(B, H // RB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (B, 4) coeff table
            pl.BlockSpec((1, H, W * C), lambda b, r: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, RB, W * C), lambda b, r: (b, r, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W * C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(tab, x2)
    return out.reshape(B, H, W, C)


def warp_rotate_center_exact(
    x: Array,
    R: Array,
    padding_mode: str = "border",
    interpret: bool = False,
) -> Optional[Array]:
    """Exact 4-tap bilinear warp out(p) = x(R^{-1}(p - c) + c), c = (H//2,
    W//2) — drop-in for `_warp_center_affine(x, R, padding_mode)` at eval,
    for per-sample ROTATION (or rotoreflection-factored) matrices R (B,2,2).

    Requires |R^{-1}| entries <= 1 (true for orthogonal R) so the source
    band a destination tile touches is bounded; general affines must keep
    the XLA path. Returns None when the image shape has no efficient tiling
    (caller falls back to the XLA warp).
    """
    B, H, W, C = x.shape
    if exact_warp_tiling(H, W) is None:
        return None
    # inverse coefficients, identical algebra to _warp_center_affine
    Rm = R.astype(jnp.float32)
    r00, r01 = Rm[:, 0, 0], Rm[:, 0, 1]
    r10, r11 = Rm[:, 1, 0], Rm[:, 1, 1]
    det = r00 * r11 - r01 * r10
    tab = jnp.stack([r11 / det, -r01 / det, -r10 / det, r00 / det], axis=-1)
    return _warp_exact_call(x, tab, padding_mode, interpret)
