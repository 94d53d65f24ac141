"""Pallas TPU kernel: materialize the exact rot90/flip group orbit.

The optimized discrete canonicalizer and the group-robustness evaluators
need all |G| transformed copies of the batch (the reference's Python loop at
discrete_group.py:387-427 — BASELINE.json's north-star fusion target). For
the D4 subgroup (90-degree multiples and horizontal flips) every element is
an exact permutation of pixels, so the orbit is pure data movement:
one pallas program per (element, image) copies the input VMEM block to the
output with the right transpose/reversal — no interpolation, no HBM
round-trips between elements.

Non-multiples of 90 degrees fall back to the shared bilinear warp
(ops/warp.py); `materialize_orbit` composes both paths and is the single
entry point used by the canonicalizers.

The kernel keeps NHWC with the channel axis minor; rot90 is a swap of the
two major axes plus a reversal, which Mosaic supports on VMEM arrays. A
pure-XLA fallback (`_orbit_xla`) with identical semantics runs on CPU (and
anywhere pallas is unavailable); tests assert the two paths match bit-wise.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

__all__ = ["rot90_flip_orbit", "materialize_orbit"]


def _apply_d4(x: Array, k: int, flip: bool) -> Array:
    """Exact D4 element on (..., H, W, C): rot90^k then optional hflip."""
    y = jnp.rot90(x, k=k, axes=(-3, -2))
    if flip:
        y = y[..., :, ::-1, :]
    return y


def _orbit_xla(x: Array, ks: Tuple[int, ...], flips: Tuple[bool, ...]) -> Array:
    """(B, H, W, C) -> (G, B, H, W, C) via exact permutations."""
    return jnp.stack([_apply_d4(x, k, f) for k, f in zip(ks, flips)], axis=0)


def _orbit_pallas(x: Array, ks: Tuple[int, ...], flips: Tuple[bool, ...]) -> Array:
    """Pallas TPU kernel: one program per (element, image, channel).

    Blocks are (H, W) single-channel slices so the lane dimension is W
    (128-aligned-ish) instead of a tiny C. Mosaic has no `rev` lowering, so
    axis reversals run as anti-diagonal matmuls on the MXU (a (N, N)
    exchange matrix contraction — cheap at these sizes) and the 90-degree
    transpose uses the native 2D transpose:

        rot90^1 = RS . T      rot90^2 = RS . RL      rot90^3 = RL . T
        hflip   = RL          (RS/RL = sublane/lane reversal)
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = x.shape
    assert H == W, "exact orbit kernel needs square images"
    G = len(ks)
    ks_arr = tuple(ks)
    flips_arr = tuple(flips)

    def kernel(in_ref, out_ref):
        g = pl.program_id(0)
        img = in_ref[0, 0]  # (H, W)
        # exchange (anti-identity) matrix built from iota — no `rev` needed
        rows = jax.lax.broadcasted_iota(jnp.int32, (H, H), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (H, H), 1)
        ex = (rows + cols == H - 1).astype(img.dtype)

        def rl(y):  # reverse lanes (last axis)
            return jax.lax.dot_general(
                y, ex, (((1,), (0,)), ((), ())),
                preferred_element_type=img.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )

        def rs(y):  # reverse sublanes (first axis)
            return jax.lax.dot_general(
                ex, y, (((1,), (0,)), ((), ())),
                preferred_element_type=img.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )

        def d4(y, k, f):
            if k == 1:
                y = rs(y.T)
            elif k == 2:
                y = rs(rl(y))
            elif k == 3:
                y = rl(y.T)
            if f:
                y = rl(y)
            return y

        for gi, (k, f) in enumerate(zip(ks_arr, flips_arr)):
            @pl.when(g == gi)
            def _(k=k, f=f):
                out_ref[0, 0, 0] = d4(img, k, f)

    # channel-major layout so the (H, W) plane owns the sublane/lane dims
    xt = jnp.moveaxis(x, -1, 1)  # (B, C, H, W)
    grid = (G, B, C)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, H, W), lambda g, b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, H, W), lambda g, b, c: (g, b, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, B, C, H, W), x.dtype),
    )(xt)
    return jnp.moveaxis(out, 2, -1)  # (G, B, H, W, C)


@functools.partial(
    jax.jit, static_argnames=("num_rotations", "reflections", "use_pallas", "sign")
)
def rot90_flip_orbit(
    x: Array,
    num_rotations: int = 4,
    reflections: bool = False,
    use_pallas: bool = False,
    sign: float = -1.0,
) -> Array:
    """Exact orbit for C4/D4 (num_rotations must divide into 90s).

    Args:
        x: (B, H, W, C), H == W.
        num_rotations: 1, 2 or 4 (elements at 360/n degree steps that are
            90-degree multiples).
        reflections: add the hflip coset (D_n).

    Returns:
        (G, B, H, W, C) with group-major ordering [rotations, reflections],
        matching the optimized canonicalizer's orbit layout.
    """
    assert 4 % num_rotations == 0 or num_rotations == 4, "exact path needs 90-degree multiples"
    step = 4 // num_rotations
    # kornia rotate(x, +90k) == rot90(x, k); the canonicalizer applies
    # rotate(x, -theta_g) (sign=-1); GroupInference applies rotate(x, +theta_g)
    # per element (sign=+1, reference inference_utils.py:100-122)
    s = 1 if sign > 0 else -1
    ks = tuple((s * step * i) % 4 for i in range(num_rotations))
    flips = tuple(False for _ in range(num_rotations))
    if reflections:
        ks = ks + ks
        flips = flips + tuple(True for _ in range(num_rotations))
    if use_pallas:
        return _orbit_pallas(x, ks, flips)
    return _orbit_xla(x, ks, flips)


def materialize_orbit(
    x: Array,
    num_rotations: int,
    group_type: str = "rotation",
    padding_mode: str = "border",
    use_pallas: bool = False,
    sign: float = -1.0,
    mode: str = "exact",
) -> Array:
    """Full |G|-orbit: exact permutations when all angles are 90-degree
    multiples, shared bilinear warp otherwise.

    Returns (G*B, H, W, C), group-major — the layout the optimized
    canonicalizer consumes (reference discrete_group.py:411-427).
    """
    B = x.shape[0]
    refl = group_type == "roto-reflection"
    if num_rotations in (1, 2, 4) and x.shape[1] == x.shape[2]:
        orbit = rot90_flip_orbit(
            x, num_rotations=num_rotations, reflections=refl,
            use_pallas=use_pallas, sign=sign,
        )
        return orbit.reshape((-1,) + x.shape[1:])
    from equiadapt_tpu.ops.warp import _residual_rotate, hflip

    # per-element *static* warps: the orbit angles are trace-time constants,
    # so every element avoids the slow dynamic-gather path; mode="fast"
    # resolves non-90 residuals via the two-pass MXU rotation
    degrees = np.linspace(0.0, 360.0, num_rotations + 1)[:num_rotations]
    rot = jnp.concatenate(
        [
            x
            if (float(sign) * float(d)) % 360.0 == 0.0
            else _residual_rotate(x, float(sign) * float(d), padding_mode, mode)
            for d in degrees
        ],
        axis=0,
    )
    if refl:
        rot = jnp.concatenate([rot, hflip(rot)], axis=0)
    return rot
