"""Continuous-group (SO(2) / O(2)) image canonicalizers.

TPU-native rebuild of reference equiadapt/images/canonicalization/
continuous_group.py:15-497. The canonicalization network emits 2D vector
field(s); a rotation (or rotoreflection) matrix is built from them and the
image is warped into canonical pose by the matrix inverse.

Warp algebra: the reference pads (edge, 0.5W), builds a 2x3 affine fixing the
*padded* center c_p = ((H+2p)//2, (W+2p)//2) and warps, then center-crops
(continuous_group.py:191-208). Because c_p - p == H//2, this whole sandwich
equals one border-sampled `warp_affine` about center (H//2, W//2) on the
unpadded image — implemented that way here (no 2x intermediate).

The "transpose trick" (continuous_group.py:183: negate the off-diagonal)
turns the predicted rotation into its inverse before warping; the prior loss
is computed on the *stored* matrix rep, whose MSE-to-identity is invariant to
that transpose.

invert_canonicalization: the reference defaults to the unimplemented
"vector" induced rep (continuous_group.py:224 -> images/utils.py:90-92) and
would crash for scalar/regular since it feeds matrices into an angle-based
rotate. Here "scalar" is implemented properly (warp outputs by the forward
group element); "vector" remains NotImplemented for parity.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from equiadapt_tpu.common.base import BaseCanonicalization
from equiadapt_tpu.common.info import (
    ContinuousCanonicalizationInfo,
    ContinuousGroupElement,
)
from equiadapt_tpu.common.math import det_2x2, gram_schmidt_2d, rotmat_2d_from_vector
from equiadapt_tpu.ops.warp import bilinear_sample, center_crop, hflip, resize

Array = jnp.ndarray

__all__ = [
    "ContinuousGroupImageCanonicalization",
    "SteerableImageCanonicalization",
    "OptimizedSteerableImageCanonicalization",
    "steerable_optimization_loss",
]


def _transpose_trick(R: Array) -> Array:
    """Negate off-diagonals: for a rotation matrix this is its inverse
    (reference continuous_group.py:183)."""
    flip = jnp.array([[1.0, -1.0], [-1.0, 1.0]], dtype=R.dtype)
    return R * flip


def _exact_warp(x: Array, R: Array, padding_mode: str, training: bool) -> Array:
    """Exact-mode warp dispatch (KernelOptions.exact_warp).

    Eval on TPU with a concrete batch runs the in-VMEM pallas kernel
    (ops/pallas/bilinear_warp.py — same 4-tap bilinear numerics, ~10x
    faster than the XLA dynamic gather); training keeps the XLA warp so
    gradients flow through the sample coordinates (reference parity,
    kornia warp_affine autodiff at continuous_group.py:207).
    """
    if not training and isinstance(x.shape[0], int):
        # symbolic-batch export falls back to the XLA form
        from equiadapt_tpu.kernel_options import current_kernel_options

        ew = current_kernel_options().exact_warp
        interpret = ew == "interpret"  # CPU fused-graph coverage knob
        if interpret or (ew == "pallas" and jax.default_backend() == "tpu"):
            from equiadapt_tpu.ops.pallas.bilinear_warp import (
                warp_rotate_center_exact,
            )

            y = warp_rotate_center_exact(
                x, R, padding_mode, interpret=interpret
            )
            if y is not None:  # None: no efficient tiling for this shape
                return y
    return _warp_center_affine(x, R, padding_mode)


def _warp_center_affine(x: Array, R: Array, padding_mode: str) -> Array:
    """Warp with forward map dst = R (src - c) + c, c = (H//2, W//2).

    Equivalent to the reference's pad -> warp_affine([R | t]) -> crop chain
    (see module docstring). R rows are (x, y) like kornia's matrices.
    """
    B, H, W, _ = x.shape
    dtype = jnp.promote_types(x.dtype, jnp.float32)
    Rm = R.astype(dtype)
    cx, cy = H // 2, W // 2  # reference uses shape[-2]//2, shape[-1]//2
    # sampling inverse: src = R^{-1} (dst - c) + c
    r00, r01 = Rm[:, 0, 0], Rm[:, 0, 1]
    r10, r11 = Rm[:, 1, 0], Rm[:, 1, 1]
    det = r00 * r11 - r01 * r10
    i00, i01 = r11 / det, -r01 / det
    i10, i11 = -r10 / det, r00 / det
    ys = jnp.arange(H, dtype=dtype)
    xs = jnp.arange(W, dtype=dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    dx = jnp.broadcast_to(gx[None], (B, H, W)) - cx
    dy = jnp.broadcast_to(gy[None], (B, H, W)) - cy
    src_x = i00[:, None, None] * dx + i01[:, None, None] * dy + cx
    src_y = i10[:, None, None] * dx + i11[:, None, None] * dy + cy
    return bilinear_sample(x, src_x, src_y, padding_mode=padding_mode)


class ContinuousGroupImageCanonicalization(BaseCanonicalization):
    """Base continuous image canonicalizer (continuous_group.py:15-230)."""

    canonicalization_network: nn.Module
    in_shape: Tuple[int, int, int]  # (H, W, C)
    input_crop_ratio: float = 1.0
    resize_shape: Optional[int] = None
    group_type: str = "rotation"
    # "exact": dynamic-gather bilinear warp (differentiable in the rotation,
    # torch-parity). "fast": 3-shear pallas kernel (ops/pallas/
    # shear_rotate.py) — ~68x faster on the target TPU; at training time it
    # runs through `warp_center_rotation_fast_diff` (custom_vjp with
    # closed-form warp gradients, ops/warp.py), so gradients still reach
    # the rotation matrix without the dynamic-gather cost.
    warp_mode: str = "exact"
    # computation dtype for the energy network + warps; None = input dtype
    compute_dtype: Optional[Any] = None
    # canonicalized-output dtype: None = cast back to the input dtype;
    # "compute" = keep compute_dtype (see discrete_group.py — serving knob)
    output_dtype: Optional[str] = None

    @property
    def is_grayscale(self) -> bool:
        return self.in_shape[-1] == 1

    @property
    def padding_mode(self) -> str:
        return "zeros" if self.is_grayscale else "border"

    def transformations_before_canonicalization_network_forward(self, x: Array) -> Array:
        if self.is_grayscale:
            return x
        H, W = self.in_shape[0], self.in_shape[1]
        ch = math.ceil(H * self.input_crop_ratio)
        cw = math.ceil(W * self.input_crop_ratio)
        if (ch, cw) != (H, W):
            x = center_crop(x, (ch, cw))
        if self.resize_shape is not None:
            x = resize(x, (self.resize_shape, self.resize_shape))
        return x

    def get_group_from_out_vectors(
        self, out_vectors: Array
    ) -> Tuple[ContinuousGroupElement, Array]:
        """Network vectors -> group element + matrix rep
        (reference continuous_group.py:113-160).

        out_vectors: (B, k, 2) — k >= 2 for roto-reflection (Gram-Schmidt
        2-frame with determinant-based reflection extraction), k >= 1 for
        rotation (first vector normalized + 90-degree companion).
        """
        if self.group_type == "roto-reflection":
            frames = gram_schmidt_2d(out_vectors[:, :2])  # (B, 2, 2)
            det = det_2x2(frames)
            reflect = (1.0 - det) / 2.0  # 1 where det == -1
            # remove the reflection component by flipping the second column
            # where det < 0 (reference :148-149)
            col_flip = jnp.stack(
                [jnp.ones_like(det), 1.0 - 2.0 * (det < 0)], axis=-1
            )  # (B, 2): multiplier per column
            rotation = frames * col_flip[:, None, :]
            element = ContinuousGroupElement(rotation=rotation, reflection=reflect)
            return element, frames
        rotation = rotmat_2d_from_vector(out_vectors[:, 0])
        element = ContinuousGroupElement(rotation=rotation, reflection=None)
        return element, rotation

    def get_groupelement(
        self, x: Array, training: bool
    ) -> Tuple[ContinuousGroupElement, Array, Dict[str, Array]]:
        raise NotImplementedError

    @nn.compact
    def canonicalize(
        self,
        x: Array,
        targets: Optional[Any] = None,
        *,
        training: bool = False,
        **kwargs: Any,
    ):
        """Reference continuous_group.py:162-210."""
        in_dtype = x.dtype
        x_energy = (
            x.astype(self.compute_dtype) if self.compute_dtype is not None else x
        )
        element, matrix_rep, extras = self.get_groupelement(x_energy, training)
        R_inv = _transpose_trick(element.rotation)
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        if element.reflection is not None:
            r = element.reflection[:, None, None, None].astype(x.dtype)
            x = (1.0 - r) * x + r * hflip(x)
        if self.warp_mode == "fast":
            if training:
                from equiadapt_tpu.ops.warp import (
                    warp_center_rotation_fast_diff,
                )

                x = warp_center_rotation_fast_diff(x, R_inv, self.padding_mode)
            else:
                from equiadapt_tpu.ops.pallas.shear_rotate import (
                    warp_rotate_center_fast,
                )

                x = warp_rotate_center_fast(x, R_inv, self.padding_mode)
        else:
            x = _exact_warp(x, R_inv, self.padding_mode, training)
        if self.output_dtype != "compute":
            x = x.astype(in_dtype)
        info = ContinuousCanonicalizationInfo(
            matrix_rep=matrix_rep, element=element, extras=extras
        )
        if targets is not None:
            return x, targets, info
        return x, info

    def invert_canonicalization(
        self,
        info: ContinuousCanonicalizationInfo,
        x_canonicalized_out: Array,
        induced_rep_type: str = "vector",
        training: bool = False,
        **kwargs: Any,
    ) -> Array:
        if induced_rep_type == "vector":
            raise NotImplementedError(
                "Action for vector representation is not implemented (matches reference)"
            )
        if induced_rep_type == "scalar":
            # forward group element: warp by R (then reflect), inverse of
            # canonicalize's (reflect then warp by R^{-1})
            if self.warp_mode == "fast":
                if training:
                    from equiadapt_tpu.ops.warp import (
                        warp_center_rotation_fast_diff,
                    )

                    y = warp_center_rotation_fast_diff(
                        x_canonicalized_out, info.element.rotation, "zeros"
                    )
                else:
                    from equiadapt_tpu.ops.pallas.shear_rotate import (
                        warp_rotate_center_fast,
                    )

                    y = warp_rotate_center_fast(
                        x_canonicalized_out, info.element.rotation, "zeros"
                    )
            else:
                y = _exact_warp(
                    x_canonicalized_out, info.element.rotation, "zeros",
                    training,
                )
            if info.element.reflection is not None:
                r = info.element.reflection[:, None, None, None]
                y = (1.0 - r) * y + r * hflip(y)
            return y
        raise ValueError("induced_rep_type must be scalar or vector for continuous groups")


class SteerableImageCanonicalization(ContinuousGroupImageCanonicalization):
    """Vector field from an SO(2)-steerable network
    (reference continuous_group.py:233-311)."""

    def get_groupelement(self, x: Array, training: bool):
        x = self.transformations_before_canonicalization_network_forward(x)
        out_vectors = self.canonicalization_network(x, training=training)  # (B, k, 2)
        element, matrix_rep = self.get_group_from_out_vectors(out_vectors)
        return element, matrix_rep, {}


class OptimizedSteerableImageCanonicalization(ContinuousGroupImageCanonicalization):
    """Self-supervised steerable canonicalizer
    (reference continuous_group.py:314-497).

    Augments the batch with random rotations (+ optional reflections) whose
    ground-truth matrices are known, runs the network on [x, x_aug] in one
    pass, and regresses predicted augmented matrices onto the ground truth
    (`steerable_optimization_loss`).
    """

    artifact_err_wt: float = 0.0

    def group_augment(self, x: Array, rng: jax.Array) -> Tuple[Array, Array]:
        """Random rotation/reflection augmentation with known GT matrices.

        Implements pad -> F.affine_grid/grid_sample (align_corners=False) ->
        crop in one border-clamped sampling pass, including the
        grid_sample <-> warp_affine convention fix of the reference
        (continuous_group.py:407-409: GT matrices get the transpose trick).
        """
        B, H, W, _ = x.shape
        rng_a, rng_r = jax.random.split(rng)
        angles = jax.random.uniform(rng_a, (B,)) * 2.0 * jnp.pi
        cos_a, sin_a = jnp.cos(angles), jnp.sin(angles)
        theta = jnp.zeros((B, 2, 2), dtype=x.dtype)
        theta = theta.at[:, 0, 0].set(cos_a)
        theta = theta.at[:, 0, 1].set(-sin_a)
        theta = theta.at[:, 1, 0].set(sin_a)
        theta = theta.at[:, 1, 1].set(cos_a)
        if self.group_type == "roto-reflection":
            reflect = jax.random.randint(rng_r, (B,), 0, 2).astype(x.dtype) * 2.0 - 1.0
            theta = theta.at[:, 0, 0].multiply(reflect)

        # grid_sample on the padded image, sampled directly from the
        # unpadded one (pad p = ceil(0.5 * W), edge mode -> border clamp)
        p = 0 if self.is_grayscale else math.ceil(W * 0.5)
        Hp, Wp = H + 2 * p, W + 2 * p
        dtype = jnp.promote_types(x.dtype, jnp.float32)
        ys = jnp.arange(H, dtype=dtype) + p  # dst coords in padded frame
        xs = jnp.arange(W, dtype=dtype) + p
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        nx = (2.0 * gx + 1.0) / Wp - 1.0
        ny = (2.0 * gy + 1.0) / Hp - 1.0
        nx = jnp.broadcast_to(nx[None], (B, H, W))
        ny = jnp.broadcast_to(ny[None], (B, H, W))
        sx_n = theta[:, 0, 0, None, None] * nx + theta[:, 0, 1, None, None] * ny
        sy_n = theta[:, 1, 0, None, None] * nx + theta[:, 1, 1, None, None] * ny
        src_x = ((sx_n + 1.0) * Wp - 1.0) / 2.0 - p
        src_y = ((sy_n + 1.0) * Hp - 1.0) / 2.0 - p
        mode = self.padding_mode
        x_aug = bilinear_sample(x, src_x, src_y, padding_mode=mode)

        # convention fix: grid_sample's theta corresponds to warp_affine's
        # transpose (reference :407-409)
        gt = _transpose_trick(theta)
        return x_aug, gt

    def get_groupelement(self, x: Array, training: bool):
        rng = self.make_rng("augment")
        x_aug, gt = self.group_augment(x, rng)
        x_all = jnp.concatenate([x, x_aug], axis=0)
        x_all = self.transformations_before_canonicalization_network_forward(x_all)
        out_all = self.canonicalization_network(x_all, training=training)
        out_all = out_all.reshape(x_all.shape[0], -1, 2)  # (2B, k, 2)
        out, out_aug = jnp.split(out_all, 2, axis=0)
        element, matrix_rep = self.get_group_from_out_vectors(out)
        _, matrix_rep_aug = self.get_group_from_out_vectors(out_aug)
        extras = {
            "matrix_rep_augmented": matrix_rep_aug,
            "matrix_rep_augmented_gt": gt,
        }
        return element, matrix_rep, extras


def steerable_optimization_loss(info: ContinuousCanonicalizationInfo) -> Array:
    """MSE(predicted augmented reps, ground-truth augmentation matrices)
    (reference continuous_group.py:476-497)."""
    return jnp.mean(
        (info.extras["matrix_rep_augmented"] - info.extras["matrix_rep_augmented_gt"]) ** 2
    )
