from equiadapt_tpu.pipelines.classification import (
    ImageClassifierPipeline,
    TrainState,
    classification_loss,
    create_train_state,
    group_inference,
    make_eval_step,
    make_optimizer,
    make_train_step,
    vanilla_inference,
)
from equiadapt_tpu.pipelines.nbody import (
    NBodyPipeline,
    create_nbody_state,
    make_nbody_train_step,
)
from equiadapt_tpu.pipelines.pointcloud import (
    PointcloudClassificationPipeline,
    PointcloudPartSegPipeline,
    create_pointcloud_state,
    make_pointcloud_train_step,
)

__all__ = [
    "ImageClassifierPipeline",
    "TrainState",
    "classification_loss",
    "create_train_state",
    "group_inference",
    "make_eval_step",
    "make_optimizer",
    "make_train_step",
    "vanilla_inference",
    "NBodyPipeline",
    "create_nbody_state",
    "make_nbody_train_step",
    "PointcloudClassificationPipeline",
    "PointcloudPartSegPipeline",
    "create_pointcloud_state",
    "make_pointcloud_train_step",
]
