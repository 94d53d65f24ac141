"""SE(3) canonicalization for n-body dynamics.

TPU-native rebuild of reference equiadapt/nbody/canonicalization/
euclidean_group.py:8-157. Dense (B, n_nodes, 3) tensors; canonicalization is
two batched matmuls (positions and velocities projected into the predicted
frame after removing the translation), invert is one matmul + add. The
kwargs-order-dependent `kwargs.values()` unpacking of the reference
(euclidean_group.py:104, a documented wart) is replaced by named arguments.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from equiadapt_tpu.common.base import BaseCanonicalization
from equiadapt_tpu.common.info import (
    ContinuousCanonicalizationInfo,
    ContinuousGroupElement,
)
from equiadapt_tpu.common.math import modified_gram_schmidt

Array = jnp.ndarray

__all__ = ["EuclideanGroupNBody"]


class EuclideanGroupNBody(BaseCanonicalization):
    """SE(3) n-body canonicalizer (reference euclidean_group.py:8-157).

    The canonicalization network must return
    (rotation_vectors (B, 3, 3), translation (B, 3)) — e.g. VNDeepSets.
    """

    canonicalization_network: nn.Module

    @nn.compact
    def canonicalize(
        self,
        x: Array,
        targets: Optional[Any] = None,
        *,
        loc: Array = None,
        vel: Array = None,
        charges: Optional[Array] = None,
        adjacency: Optional[Array] = None,
        training: bool = False,
        **kwargs: Any,
    ):
        """Canonicalize locations and velocities.

        Args:
            x: unused node scalars, kept for API parity with the reference
                forward (euclidean_group.py:27-41).
            loc, vel: (B, n, 3).
            charges: (B, n, 1), needed for charge-aware canon features.

        Returns:
            ((canonical_loc, canonical_vel), info).
        """
        vectors, translation = self.canonicalization_network(
            loc, vel, charges=charges, adjacency=adjacency, training=training
        )
        rotation = modified_gram_schmidt(vectors)  # (B, 3, 3), rows orthonormal
        element = ContinuousGroupElement(rotation=rotation, translation=translation)
        info = ContinuousCanonicalizationInfo(matrix_rep=rotation, element=element)

        centered = loc - translation[:, None, :]
        canonical_loc = jnp.einsum("bnd,bkd->bnk", centered, rotation)
        canonical_vel = jnp.einsum("bnd,bkd->bnk", vel, rotation)
        return (canonical_loc, canonical_vel), info

    def invert_canonicalization(
        self,
        info: ContinuousCanonicalizationInfo,
        x_canonicalized_out: Array,
        **kwargs: Any,
    ) -> Array:
        """y -> y @ R + t (reference euclidean_group.py:126-137)."""
        R = info.element.rotation
        t = info.element.translation
        return jnp.einsum("bnk,bkd->bnd", x_canonicalized_out, R) + t[:, None, :]
