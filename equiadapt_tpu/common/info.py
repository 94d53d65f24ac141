"""Canonicalization info pytrees — the functional replacement for the
reference's mutable `canonicalization_info_dict` side-channel.

The reference stashes group elements / activations on the module instance
(reference: equiadapt/common/basecanonicalization.py:41,
equiadapt/images/canonicalization/discrete_group.py:165-171), which is hostile
to `jit` (hidden state, not threaded through the trace). Here every
canonicalize call returns an explicit `CanonicalizationInfo` pytree that is
passed to `invert_canonicalization`, `prior_regularization_loss` and
`identity_metric`. Being a pytree, it flows through `jit`/`vmap`/`pjit`
/`grad` and shards with the batch axis.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

Array = jnp.ndarray


class DiscreteGroupElement(struct.PyTreeNode):
    """Selected element of a discrete image group (C_n or D_n).

    rotation_deg: (B,) rotation angle in degrees (differentiable via the
        straight-through one-hot inner product, reference
        discrete_group.py:110-133).
    reflection: (B,) soft indicator in [0,1]; None for pure-rotation groups.
    """

    rotation_deg: Array
    reflection: Optional[Array] = None


class DiscreteCanonicalizationInfo(struct.PyTreeNode):
    """Everything produced by one discrete canonicalize pass.

    group_activations: (B, |G|) raw activations (pre-softmax), used by the
        prior CE loss and the identity metric.
    onehot: (B, |G|) differentiable (straight-through / Gumbel) one-hot.
    element: the selected group element.
    num_rotations / group_type: static metadata (not traced).
    extras: auxiliary tensors for optimization-specific losses
        (e.g. `vector_out` of the optimized canonicalizer,
        reference discrete_group.py:446-473).
    """

    group_activations: Array
    onehot: Array
    element: DiscreteGroupElement
    num_rotations: int = struct.field(pytree_node=False, default=4)
    group_type: str = struct.field(pytree_node=False, default="rotation")
    extras: Dict[str, Any] = struct.field(default_factory=dict)

    @property
    def num_group(self) -> int:
        return self.num_rotations * (2 if self.group_type == "roto-reflection" else 1)


class ContinuousGroupElement(struct.PyTreeNode):
    """Selected element of a continuous group (SO(2)/O(2)/SO(3)/SE(3)).

    rotation: (B, d, d) rotation matrices.
    reflection: (B,) or broadcastable soft indicator; None if not O(2).
    translation: (B, d) translation vectors; None outside SE(n)/E(n).
    """

    rotation: Array
    reflection: Optional[Array] = None
    translation: Optional[Array] = None


class ContinuousCanonicalizationInfo(struct.PyTreeNode):
    """Result of a continuous canonicalize pass.

    matrix_rep: (B, d, d) group-element matrix representation used by the MSE
        prior loss and identity metric (reference
        basecanonicalization.py:390-430).
    element: the group element applied.
    extras: auxiliary tensors for optimization-specific losses (e.g. predicted
        vs ground-truth augmented reps, reference continuous_group.py:458-472).
    """

    matrix_rep: Array
    element: ContinuousGroupElement
    extras: Dict[str, Any] = struct.field(default_factory=dict)


class IdentityCanonicalizationInfo(struct.PyTreeNode):
    """No-op canonicalization (reference basecanonicalization.py:96-179)."""


CanonicalizationInfo = Any  # union of the three concrete infos


def prior_regularization_loss(info: CanonicalizationInfo) -> Array:
    """Loss biasing the canonical pose toward identity.

    - Discrete: cross-entropy of the raw activations against class 0
      (reference basecanonicalization.py:290-301). Note the reference uses the
      *unscaled* activations (no beta), reproduced here.
    - Continuous: MSE between the matrix rep and the identity
      (reference basecanonicalization.py:390-408).
    - Identity: 0.
    """
    if isinstance(info, IdentityCanonicalizationInfo):
        return jnp.asarray(0.0)
    if isinstance(info, DiscreteCanonicalizationInfo):
        logp = jax.nn.log_softmax(info.group_activations, axis=-1)
        return -jnp.mean(logp[..., 0])
    if isinstance(info, ContinuousCanonicalizationInfo):
        d = info.matrix_rep.shape[-1]
        eye = jnp.eye(d, dtype=info.matrix_rep.dtype)
        return jnp.mean((info.matrix_rep - eye) ** 2)
    raise TypeError(f"Unknown canonicalization info: {type(info)}")


def identity_metric(info: CanonicalizationInfo) -> Array:
    """Fraction-of-identity / closeness-to-identity metric.

    - Discrete: fraction of the batch whose argmax is the identity element
      (reference basecanonicalization.py:303-311).
    - Continuous: 1 - MSE(rep, I) (reference basecanonicalization.py:410-430).
    - Identity: 1.
    """
    if isinstance(info, IdentityCanonicalizationInfo):
        return jnp.asarray(1.0)
    if isinstance(info, DiscreteCanonicalizationInfo):
        return jnp.mean(
            (jnp.argmax(info.group_activations, axis=-1) == 0).astype(jnp.float32)
        )
    if isinstance(info, ContinuousCanonicalizationInfo):
        d = info.matrix_rep.shape[-1]
        eye = jnp.eye(d, dtype=info.matrix_rep.dtype)
        return 1.0 - jnp.mean((info.matrix_rep - eye) ** 2)
    raise TypeError(f"Unknown canonicalization info: {type(info)}")
