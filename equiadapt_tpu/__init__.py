"""equiadapt_tpu — TPU-native learned-canonicalization framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
`arnab39/equiadapt` (learned canonicalization for images, point clouds and
n-body graphs), designed TPU-first: NHWC layouts, pure-functional
canonicalizer API returning explicit info pytrees, vmapped group orbits,
single-jit data-parallel training over ICI meshes.

Flat re-exports mirror the reference's `equiadapt/__init__.py` so users can
map names 1:1.
"""

from equiadapt_tpu.kernel_options import (
    KernelOptions,
    current_kernel_options,
    kernel_options,
)
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
from equiadapt_tpu.images import (
    ContinuousGroupImageCanonicalization,
    ConvNetwork,
    CustomEquivariantNetwork,
    DiscreteGroupImageCanonicalization,
    EquivariantNetwork,
    EquivariantWideResNet,
    GroupEquivariantImageCanonicalization,
    OptimizedGroupEquivariantImageCanonicalization,
    OptimizedSteerableImageCanonicalization,
    ResNet18Network,
    RotationEquivariantConv,
    RotationEquivariantConvLift,
    RotoReflectionEquivariantConv,
    RotoReflectionEquivariantConvLift,
    SteerableImageCanonicalization,
    WideResNet50Network,
    WideResNet101Network,
)
from equiadapt_tpu.images.networks.steerable import SteerableNetwork
from equiadapt_tpu.nbody import EuclideanGroupNBody, VNDeepSets
from equiadapt_tpu.ops import get_action_on_image_features
from equiadapt_tpu.pointcloud import (
    ContinuousGroupPointcloudCanonicalization,
    EquivariantPointcloudCanonicalization,
    graph_feature_cross,
    VNBatchNorm,
    VNBilinear,
    VNLeakyReLU,
    VNLinear,
    VNLinearLeakyReLU,
    VNMaxPool,
    VNSmall,
    VNSoftplus,
    VNStdFeature,
    mean_pool,
)

# reference name for the pointcloud edge-feature builder
# (equiadapt/__init__.py exports `get_graph_feature_cross`)
get_graph_feature_cross = graph_feature_cross

__version__ = "0.4.0"
