"""SO(3) point-cloud canonicalization via vector-neuron frame estimation.

TPU-native rebuild of reference equiadapt/pointcloud/canonicalization/
continuous_group.py:13-134. Points are (B, N, 3) rows (the reference uses
(B, 3, N) columns); canonicalization is one batched matmul
x_canon = x @ R^T, i.e. each point expressed in the predicted orthonormal
frame. Rotation-only, like the reference (its module docstring:
proof-of-concept, no translation).
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

        x_canon = x @ R^T (rows of R are the frame vectors), the batched
        equivalent of the reference's bmm chain (:74-79).
        """
        element, matrix_rep = self.get_groupelement(x, training)
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
        """Rotate canonical-frame outputs back: y @ R.

        The reference never overrides invert for point clouds (its pipelines
        don't use it); provided here for completeness — exact inverse of
        `canonicalize` for vector outputs like part-segmentation point
        offsets.
        """
        return jnp.einsum("bnk,bkd->bnd", x_canonicalized_out, info.element.rotation)


class EquivariantPointcloudCanonicalization(ContinuousGroupPointcloudCanonicalization):
    """Frame from a VN network + Gram-Schmidt (reference :84-134)."""

    def get_groupelement(self, x: Array, training: bool):
        vectors = self.canonicalization_network(x, training=training)  # (B, 3, 3)
        rotation = gram_schmidt(vectors)
        element = ContinuousGroupElement(rotation=rotation)
        return element, rotation
