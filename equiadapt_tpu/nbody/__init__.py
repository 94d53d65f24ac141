from equiadapt_tpu.nbody.canonicalization import EuclideanGroupNBody
from equiadapt_tpu.nbody.vn_deepsets import (
    VNDeepSetLayer,
    VNDeepSets,
    complete_adjacency,
)

__all__ = [
    "EuclideanGroupNBody",
    "VNDeepSetLayer",
    "VNDeepSets",
    "complete_adjacency",
]
