from equiadapt_tpu.images.canonicalization.continuous_group import (
    ContinuousGroupImageCanonicalization,
    OptimizedSteerableImageCanonicalization,
    SteerableImageCanonicalization,
    steerable_optimization_loss,
)
from equiadapt_tpu.images.canonicalization.discrete_group import (
    DiscreteGroupImageCanonicalization,
    GroupEquivariantImageCanonicalization,
    OptimizedGroupEquivariantImageCanonicalization,
    optimization_specific_loss,
)

__all__ = [
    "ContinuousGroupImageCanonicalization",
    "OptimizedSteerableImageCanonicalization",
    "SteerableImageCanonicalization",
    "steerable_optimization_loss",
    "DiscreteGroupImageCanonicalization",
    "GroupEquivariantImageCanonicalization",
    "OptimizedGroupEquivariantImageCanonicalization",
    "optimization_specific_loss",
]
