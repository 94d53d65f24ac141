"""SO(3) point-cloud canonicalization via vector-neuron frame estimation.

TPU-native rebuild of reference equiadapt/pointcloud/canonicalization/
continuous_group.py:13-134. Points are (B, N, 3) rows (the reference uses
(B, 3, N) columns); canonicalization is one batched matmul
x_canon = x @ R^T, i.e. each point expressed in the predicted orthonormal
frame. Rotation-only by default, like the reference (its module docstring:
proof-of-concept, no translation); `enable_translation=True` upgrades the
group to SE(3) by removing the centroid before rotating — the translation
estimate the reference's own VNDeepSets uses for n-body
(nbody/canonicalization_networks/custom_equivariant_networks.py:129-137,
mean-centering) applied to clouds. The centroid is exactly
SE(3)-equivariant (centroid(xR + t) = centroid(x)R + t), so the canonical
form is translation-invariant with zero extra network cost. Reflections
are NOT handled (so this is SE(3), not E(3)): VNSmall's edge features
include cross products (graph_feature_cross), which flip sign under
improper rotations, so the estimated frame is only SO(3)-equivariant.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from equiadapt_tpu.common.base import BaseCanonicalization
from equiadapt_tpu.common.info import (
    ContinuousCanonicalizationInfo,
    ContinuousGroupElement,
)
from equiadapt_tpu.common.math import gram_schmidt

Array = jnp.ndarray

__all__ = [
    "ContinuousGroupPointcloudCanonicalization",
    "EquivariantPointcloudCanonicalization",
]


class ContinuousGroupPointcloudCanonicalization(BaseCanonicalization):
    """Base continuous point-cloud canonicalizer (reference :13-81)."""

    canonicalization_network: nn.Module
    # SE(3) mode: remove the centroid before rotating (SE(3) element with
    # t = mean over points). Off by default = reference behavior (SO(3)).
    enable_translation: bool = False

    def get_groupelement(
        self, x: Array, training: bool
    ) -> Tuple[ContinuousGroupElement, Array]:
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
        """x: (B, N, 3) -> canonical (B, N, 3) + info.

        x_canon = (x - t) @ R^T (rows of R are the frame vectors; t = 0 in
        rotation-only mode), the batched equivalent of the reference's bmm
        chain (:74-79).
        """
        element, matrix_rep = self.get_groupelement(x, training)
        if self.enable_translation:
            x = x - element.translation[:, None, :]
        x_canon = jnp.einsum("bnd,bkd->bnk", x, element.rotation)
        info = ContinuousCanonicalizationInfo(matrix_rep=matrix_rep, element=element)
        if targets is not None:
            return x_canon, targets, info
        return x_canon, info

    def invert_canonicalization(
        self,
        info: ContinuousCanonicalizationInfo,
        x_canonicalized_out: Array,
        **kwargs: Any,
    ) -> Array:
        """Map canonical-frame outputs back: y @ R (+ t for point-valued
        outputs in SE(3) mode; set `points=False` for direction-valued
        outputs like normals or part-segmentation point offsets, which
        rotate but do not translate — in `enable_translation` mode the
        default `points=True` path adds +t and is only correct for
        absolute point coordinates).

        The reference never overrides invert for point clouds (its pipelines
        don't use it); provided here for completeness.
        """
        out = jnp.einsum("bnk,bkd->bnd", x_canonicalized_out, info.element.rotation)
        if self.enable_translation and kwargs.get("points", True):
            out = out + info.element.translation[:, None, :]
        return out


class EquivariantPointcloudCanonicalization(ContinuousGroupPointcloudCanonicalization):
    """Frame from a VN network + Gram-Schmidt (reference :84-134)."""

    def get_groupelement(self, x: Array, training: bool):
        translation = None
        if self.enable_translation:
            # centroid: the unique linear SE(3)-equivariant translation
            # estimate; the VN frame network then sees a centered cloud, so
            # its rotation estimate is translation-independent too.
            translation = jnp.mean(x, axis=1)  # (B, 3)
            x = x - translation[:, None, :]
        vectors = self.canonicalization_network(x, training=training)  # (B, 3, 3)
        rotation = gram_schmidt(vectors)
        element = ContinuousGroupElement(rotation=rotation, translation=translation)
        return element, rotation
