from equiadapt_tpu.models.detection import MaskRCNNLite, maskrcnn_lite_loss
from equiadapt_tpu.models.egnn import (
    GCL,
    GCLRF,
    GNN,
    NBodyMLP,
    NBodyTransformer,
    edge_attributes,
)
from equiadapt_tpu.models.pointnet import (
    DGCNN,
    DGCNNPartSeg,
    PointNet,
    TransformNet,
    get_graph_feature,
)
from equiadapt_tpu.models.resnet import (
    ResNet,
    ResNet18,
    ResNet50,
    WideResNet50,
    WideResNet101,
)
from equiadapt_tpu.models.convert import (
    apply_pretrained_to_state,
    convert_resnet_checkpoint,
    convert_vit_checkpoint,
    load_pretrained_prediction,
    load_torch_state_dict,
)
from equiadapt_tpu.models.vit import ViT, ViTB16

__all__ = [
    "MaskRCNNLite",
    "maskrcnn_lite_loss",
    "GCL",
    "GCLRF",
    "GNN",
    "NBodyMLP",
    "NBodyTransformer",
    "edge_attributes",
    "DGCNN",
    "DGCNNPartSeg",
    "PointNet",
    "TransformNet",
    "get_graph_feature",
    "ResNet",
    "ResNet18",
    "ResNet50",
    "WideResNet50",
    "WideResNet101",
    "ViT",
    "ViTB16",
    "apply_pretrained_to_state",
    "convert_resnet_checkpoint",
    "convert_vit_checkpoint",
    "load_pretrained_prediction",
    "load_torch_state_dict",
]
