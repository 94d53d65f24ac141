"""equiadapt_tpu — TPU-native learned-canonicalization framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
`arnab39/equiadapt` (learned canonicalization for images, point clouds and
n-body graphs), designed TPU-first: NHWC layouts, pure-functional
canonicalizer API returning explicit info pytrees, vmapped group orbits,
single-jit data-parallel training over ICI meshes.

Flat re-exports mirror the reference's `equiadapt/__init__.py` so users can
map names 1:1.
"""

from equiadapt_tpu.common import (
    BaseCanonicalization,
    ContinuousCanonicalizationInfo,
    ContinuousGroupElement,
    DiscreteCanonicalizationInfo,
    DiscreteGroupElement,
    IdentityCanonicalization,
    IdentityCanonicalizationInfo,
    LieParameterization,
    gram_schmidt,
    identity_metric,
    modified_gram_schmidt,
    prior_regularization_loss,
)

__version__ = "0.1.0"
