"""Base canonicalization modules (flax.linen), pure-functional API.

The reference contract (equiadapt/common/basecanonicalization.py:29-430) is a
`torch.nn.Module` whose `forward` returns only the canonicalized input and
stashes side info on `self`. The TPU-native contract is explicit:

    x_canon, info = canonicalizer.apply(variables, x, training=...)
    y = prediction_network(x_canon)
    y_orig = canonicalizer.invert_canonicalization(info, y)
    loss += w * prior_regularization_loss(info)

`info` is a `CanonicalizationInfo` pytree (common/info.py), so the whole
pipeline is a single pure function — one `jit`, shardable with `pjit` over a
device mesh, differentiable end-to-end (gradients reach the canonicalization
network only through the straight-through / soft paths, as in the reference).

Subclass layout mirrors the reference so users can map 1:1:
  BaseCanonicalization          -> BaseCanonicalization
  IdentityCanonicalization      -> IdentityCanonicalization
  DiscreteGroupCanonicalization -> images/canonicalization/discrete_group.py
  ContinuousGroupCanonicalization -> images/.../continuous_group.py, pointcloud, nbody
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from equiadapt_tpu.common.info import (
    CanonicalizationInfo,
    IdentityCanonicalizationInfo,
    identity_metric,
    prior_regularization_loss,
)

Array = jnp.ndarray

__all__ = [
    "BaseCanonicalization",
    "IdentityCanonicalization",
    "prior_regularization_loss",
    "identity_metric",
]


class BaseCanonicalization(nn.Module):
    """Abstract canonicalizer.

    Subclasses define `__call__(x, targets=None, *, training=False, **kwargs)`
    returning `(x_canon, info)` (or `(x_canon, targets_canon, info)` when
    targets are provided) and `invert_canonicalization(info, out, **kwargs)`.

    Unlike the reference (basecanonicalization.py:38-41), the canonicalization
    network is a declared submodule and all state is threaded explicitly.
    """

    def canonicalize(
        self, x: Array, targets: Optional[Any] = None, *, training: bool = False, **kwargs: Any
    ) -> Tuple[Array, CanonicalizationInfo]:
        raise NotImplementedError

    def __call__(
        self, x: Array, targets: Optional[Any] = None, *, training: bool = False, **kwargs: Any
    ):
        return self.canonicalize(x, targets, training=training, **kwargs)

    def invert_canonicalization(
        self, info: CanonicalizationInfo, x_canonicalized_out: Array, **kwargs: Any
    ) -> Array:
        raise NotImplementedError


class IdentityCanonicalization(BaseCanonicalization):
    """No-op canonicalization (reference basecanonicalization.py:96-179).

    prior loss is 0 and the identity metric is 1 (see common/info.py handlers
    for `IdentityCanonicalizationInfo`).
    """

    @nn.compact
    def canonicalize(
        self, x: Array, targets: Optional[Any] = None, *, training: bool = False, **kwargs: Any
    ):
        info = IdentityCanonicalizationInfo()
        if targets is not None:
            return x, targets, info
        return x, info

    def invert_canonicalization(
        self, info: CanonicalizationInfo, x_canonicalized_out: Array, **kwargs: Any
    ) -> Array:
        return x_canonicalized_out
