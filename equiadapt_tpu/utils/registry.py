"""Factories: config -> canonicalization network / canonicalizer / predictor.

Mirror of the reference registries:
* images: examples/images/common/utils.py:25-118
  (get_canonicalization_network, get_canonicalizer)
* pointcloud: examples/pointcloud/common/utils.py:12-78
* nbody: examples/nbody/model_utils.py:12-57
* image prediction nets: examples/images/classification/model_utils.py:35-82

Same registry keys so the five BASELINE.md configs resolve identically.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from equiadapt_tpu.common.base import IdentityCanonicalization
from equiadapt_tpu.images.canonicalization.continuous_group import (
    OptimizedSteerableImageCanonicalization,
    SteerableImageCanonicalization,
)
from equiadapt_tpu.images.canonicalization.discrete_group import (
    GroupEquivariantImageCanonicalization,
    OptimizedGroupEquivariantImageCanonicalization,
)
from equiadapt_tpu.images.networks import (
    ConvNetwork,
    CustomEquivariantNetwork,
    EquivariantNetwork,
    EquivariantWideResNet,
    ResNet18Network,
    WideResNet50Network,
    WideResNet101Network,
)
from equiadapt_tpu.images.networks.steerable import SteerableNetwork
from equiadapt_tpu.models import (
    DGCNN,
    GNN,
    NBodyTransformer,
    PointNet,
    ResNet50,
    ViT,
)
from equiadapt_tpu.nbody.canonicalization import EuclideanGroupNBody
from equiadapt_tpu.nbody.vn_deepsets import VNDeepSets
from equiadapt_tpu.pointcloud.canonicalization import (
    EquivariantPointcloudCanonicalization,
)
from equiadapt_tpu.pointcloud.networks import VNSmall
from equiadapt_tpu.utils.config import CanonicalizationConfig, PredictionConfig


def get_image_canonicalization_network(
    cfg: CanonicalizationConfig, in_shape: Tuple[int, int, int]
) -> nn.Module:
    """in_shape is NHWC-style (H, W, C).

    Registry keys match examples/images/common/utils.py:25-81.
    """
    h = cfg.network_hyperparams
    C = in_shape[-1]
    t = cfg.canonicalization_type
    if t == "identity":
        return None
    if t == "group_equivariant":
        nets = {
            "e2cnn": lambda: EquivariantNetwork(
                in_channels=C, out_channels=h.out_channels, kernel_size=h.kernel_size,
                group_type=h.group_type, num_rotations=h.num_rotations,
                num_layers=h.num_layers, pool_after_lift=h.pool_after_lift,
                fused_pool_lift=h.fused_pool_lift,
            ),
            "equivariant_wrn": lambda: EquivariantWideResNet(
                in_channels=C, out_channels=h.out_channels, kernel_size=h.kernel_size,
                group_type=h.group_type, num_rotations=h.num_rotations,
            ),
            "custom": lambda: CustomEquivariantNetwork(
                in_channels=C, out_channels=h.out_channels, kernel_size=h.kernel_size,
                group_type=h.group_type, num_rotations=h.num_rotations,
                num_layers=h.num_layers,
            ),
        }
    elif t == "steerable":
        nets = {
            "e2cnn": lambda: SteerableNetwork(
                in_channels=C, out_channels=h.out_channels,
                kernel_size=h.kernel_size, num_layers=h.num_layers,
            ),
        }
    elif t in ("opt_group_equivariant", "opt_steerable"):
        nets = {
            "cnn": lambda: ConvNetwork(
                in_channels=C, out_channels=h.out_channels, kernel_size=h.kernel_size,
                num_layers=h.num_layers, out_vector_size=h.out_vector_size,
            ),
            "non_equivariant_resnet18": lambda: ResNet18Network(
                out_vector_size=h.out_vector_size
            ),
            "non_equivariant_wrn50": lambda: WideResNet50Network(
                out_vector_size=h.out_vector_size
            ),
            "non_equivariant_wrn101": lambda: WideResNet101Network(
                out_vector_size=h.out_vector_size
            ),
        }
    else:
        raise ValueError(f"{t} is not implemented")
    if cfg.network_type not in nets:
        raise ValueError(
            f"{cfg.network_type} is not implemented for {t} canonicalization"
        )
    return nets[cfg.network_type]()


def get_image_canonicalizer(
    cfg: CanonicalizationConfig, network: nn.Module, in_shape: Tuple[int, int, int]
):
    """Wrapper-class registry (examples/images/common/utils.py:84-118)."""
    h = cfg.network_hyperparams
    t = cfg.canonicalization_type
    if t == "identity":
        return IdentityCanonicalization()
    compute_dtype = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None
    common = dict(
        canonicalization_network=network,
        in_shape=in_shape,
        input_crop_ratio=cfg.input_crop_ratio,
        resize_shape=cfg.resize_shape,
    )
    discrete = dict(
        warp_mode=cfg.warp_mode, compute_dtype=compute_dtype,
        output_dtype=cfg.output_dtype,
    )
    if t == "group_equivariant":
        return GroupEquivariantImageCanonicalization(
            beta=cfg.beta, gradient_trick=cfg.gradient_trick,
            group_type=h.group_type, num_rotations=h.num_rotations,
            **discrete, **common,
        )
    if t == "opt_group_equivariant":
        return OptimizedGroupEquivariantImageCanonicalization(
            beta=cfg.beta, gradient_trick=cfg.gradient_trick,
            group_type=h.group_type, num_rotations=h.num_rotations,
            out_vector_size=h.out_vector_size, learn_ref_vec=cfg.learn_ref_vec,
            artifact_err_wt=cfg.artifact_err_wt, **discrete, **common,
        )
    if t == "steerable":
        return SteerableImageCanonicalization(
            group_type=h.group_type, **discrete, **common
        )
    if t == "opt_steerable":
        return OptimizedSteerableImageCanonicalization(
            group_type=h.group_type, artifact_err_wt=cfg.artifact_err_wt,
            **discrete, **common,
        )
    raise ValueError(f"{t} needs a canonicalization network implementation")


def get_pointcloud_canonicalizer(cfg: CanonicalizationConfig):
    """examples/pointcloud/common/utils.py:12-78."""
    h = cfg.network_hyperparams
    if cfg.canonicalization_type == "identity":
        return IdentityCanonicalization()
    if cfg.canonicalization_type == "continuous_group":
        net = VNSmall(n_knn=h.n_knn, pooling=h.pooling, knn_mode=h.knn_mode)
        return EquivariantPointcloudCanonicalization(
            canonicalization_network=net,
            enable_translation=cfg.enable_translation,
        )
    raise ValueError(f"{cfg.canonicalization_type} is not implemented for pointclouds")


def get_nbody_canonicalizer(cfg: CanonicalizationConfig):
    """examples/nbody/model_utils.py:12-30."""
    h = cfg.network_hyperparams
    if cfg.canonicalization_type == "identity":
        return IdentityCanonicalization()
    net = VNDeepSets(
        hidden_dim=h.hidden_dim, num_layers=h.num_layers,
        layer_pooling=h.layer_pooling, final_pooling=h.final_pooling,
        nonlinearity=h.nonlinearity, canon_feature=h.canon_feature,
        canon_translation=h.canon_translation, dropout=h.dropout, out_dim=h.out_dim,
    )
    return EuclideanGroupNBody(canonicalization_network=net)


def get_image_prediction_network(
    cfg: PredictionConfig, num_classes: int, small_images: bool
) -> nn.Module:
    """examples/images/classification/model_utils.py:35-82."""
    dtype = jnp.dtype(cfg.dtype) if cfg.dtype else jnp.float32
    if cfg.architecture == "resnet50":
        return ResNet50(
            num_classes=num_classes, small_images=small_images, dtype=dtype
        )
    if cfg.architecture == "resnet18":
        from equiadapt_tpu.models import ResNet18

        return ResNet18(
            num_classes=num_classes, small_images=small_images, dtype=dtype
        )
    if cfg.architecture == "vit":
        return ViT(num_classes=num_classes)
    raise ValueError(f"{cfg.architecture} is not implemented as prediction network")


def get_pointcloud_prediction_network(
    architecture: str, num_classes: int, **kw
) -> nn.Module:
    if architecture == "pointnet":
        return PointNet(num_classes=num_classes, **kw)
    if architecture == "DGCNN":
        return DGCNN(num_classes=num_classes, **kw)
    raise ValueError(f"{architecture} is not implemented")


def get_segmentation_prediction_network(
    architecture: str, num_classes: int = 91, **kw
) -> nn.Module:
    """Segmentation model registry (reference segmentation/model_utils.py:
    245-278: {"sam": SAMModel, "maskrcnn": MaskRCNNModel})."""
    from equiadapt_tpu.models.detection import MaskRCNNLite
    from equiadapt_tpu.models.segmentation import SAMLite

    if architecture == "sam":
        return SAMLite(**kw)
    if architecture == "sam_vit":
        # faithful pretrained-SAM encoder path (models/sam_encoder.py)
        return SAMLite(encoder="sam_vit", num_mask_tokens=4, **kw)
    if architecture == "maskrcnn":
        return MaskRCNNLite(num_classes=num_classes, **kw)
    raise ValueError(f"{architecture} is not implemented as a segmentation network")


def get_nbody_prediction_network(cfg: PredictionConfig) -> nn.Module:
    if cfg.architecture == "GNN":
        return GNN(hidden_dim=cfg.hidden_dim, num_layers=cfg.num_layers)
    if cfg.architecture == "Transformer":
        return NBodyTransformer(hidden_dim=cfg.hidden_dim, num_layers=cfg.num_layers)
    if cfg.architecture == "vndeepsets":
        return VNDeepSets(hidden_dim=cfg.hidden_dim, num_layers=cfg.num_layers, out_dim=1)
    raise ValueError(f"{cfg.architecture} is not implemented as a prediction network")
