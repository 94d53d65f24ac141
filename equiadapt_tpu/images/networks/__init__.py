from equiadapt_tpu.images.networks.conv import (
    ConvNetwork,
    ResNet18Network,
    WideResNet50Network,
    WideResNet101Network,
)
from equiadapt_tpu.images.networks.equivariant import (
    CustomEquivariantNetwork,
    EquivariantNetwork,
    EquivariantWideResNet,
    FiberBatchNorm,
)
from equiadapt_tpu.images.networks.group_conv import (
    RotationEquivariantConv,
    RotationEquivariantConvLift,
    RotoReflectionEquivariantConv,
    RotoReflectionEquivariantConvLift,
)

__all__ = [
    "ConvNetwork",
    "ResNet18Network",
    "WideResNet50Network",
    "WideResNet101Network",
    "CustomEquivariantNetwork",
    "EquivariantNetwork",
    "EquivariantWideResNet",
    "FiberBatchNorm",
    "RotationEquivariantConv",
    "RotationEquivariantConvLift",
    "RotoReflectionEquivariantConv",
    "RotoReflectionEquivariantConvLift",
]
