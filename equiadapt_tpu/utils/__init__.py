from equiadapt_tpu.utils.config import (
    CanonicalizationConfig,
    CheckpointConfig,
    Config,
    DatasetConfig,
    ExperimentConfig,
    NetworkHyperparams,
    PredictionConfig,
    TrainingLossConfig,
    compose_config,
    load_yaml,
)
from equiadapt_tpu.utils.registry import (
    get_image_canonicalization_network,
    get_image_canonicalizer,
    get_image_prediction_network,
    get_nbody_canonicalizer,
    get_nbody_prediction_network,
    get_pointcloud_canonicalizer,
    get_pointcloud_prediction_network,
    get_segmentation_prediction_network,
)

__all__ = [
    "CanonicalizationConfig",
    "CheckpointConfig",
    "Config",
    "DatasetConfig",
    "ExperimentConfig",
    "NetworkHyperparams",
    "PredictionConfig",
    "TrainingLossConfig",
    "compose_config",
    "load_yaml",
    "get_image_canonicalization_network",
    "get_image_canonicalizer",
    "get_image_prediction_network",
    "get_nbody_canonicalizer",
    "get_nbody_prediction_network",
    "get_pointcloud_canonicalizer",
    "get_pointcloud_prediction_network",
    "get_segmentation_prediction_network",
]
from equiadapt_tpu.utils.export import (
    export_apply,
    export_sharded_apply,
    load_exported,
)
