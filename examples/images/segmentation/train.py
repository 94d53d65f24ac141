"""Instance-segmentation training CLI (prior-regularized promptable model).

TPU-native analog of reference examples/images/segmentation/train.py: the
canonicalizer is trained with prior regularization while adapting a
promptable segmentation model (SAMLite here; convert a local SAM checkpoint
to go full-scale). Uses the synthetic COCO-style rectangles task when no
local COCO is present (zero egress). run_mode=test restores the
canonicalization config and weights from the checkpoint (reference
train.py:15-33 semantics) and reports the per-group-element mAP sweep.

    python examples/images/segmentation/train.py experiment.num_epochs=2 \
        experiment.loss.prior_weight=100
"""

from __future__ import annotations

import os
import sys

import jax
import optax

from equiadapt_tpu.data.coco import synthetic_coco_batch
from equiadapt_tpu.pipelines.segmentation import (
    ImageSegmentationPipeline,
    create_segmentation_state,
    make_segmentation_train_step,
    segmentation_group_inference,
)
from equiadapt_tpu.models.segmentation import SAMLite
from equiadapt_tpu.utils import (
    compose_config,
    get_image_canonicalization_network,
    get_image_canonicalizer,
)
from equiadapt_tpu.utils.checkpoint import (
    best_metric_saver,
    restore_checkpoint,
    restore_config,
)
from equiadapt_tpu.utils.metrics import MetricLogger


def main(argv) -> None:
    cfg = compose_config(
        argv,
        config_dir=os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs"),
        base=[
            "dataset.image_size=128",
            "canonicalization.network_hyperparams.out_channels=8",
        ],
    )
    if cfg.checkpoint.checkpoint_name and cfg.checkpoint.checkpoint_path:
        cfg = cfg.override(
            "checkpoint.checkpoint_path="
            f"{cfg.checkpoint.checkpoint_path}/{cfg.checkpoint.checkpoint_name}"
        )
    if cfg.experiment.run_mode == "test" and cfg.checkpoint.checkpoint_path:
        # reconstruct the exact canonicalizer from the checkpoint snapshot
        cfg = restore_config(cfg.checkpoint.checkpoint_path).override(
            "experiment.run_mode=test"
        )
    rng = jax.random.key(cfg.experiment.seed)
    size = cfg.dataset.image_size
    in_shape = (size, size, 3)

    net = get_image_canonicalization_network(cfg.canonicalization, in_shape)
    canon = get_image_canonicalizer(cfg.canonicalization, net, in_shape)
    sam = SAMLite(embed_dim=128, encoder_depth=2, decoder_depth=2, num_heads=4)
    pipe = ImageSegmentationPipeline(canonicalizer=canon, prediction_network=sam)

    batch = synthetic_coco_batch(rng, 4, image_size=size)
    tx = optax.adamw(cfg.experiment.learning_rate)
    state = create_segmentation_state(pipe, rng, batch["image"], batch["targets"], tx)
    step = make_segmentation_train_step(prior_weight=cfg.experiment.loss.prior_weight)

    def group_sweep(state, fold: int):
        val = synthetic_coco_batch(jax.random.fold_in(rng, fold), 4, image_size=size)
        return segmentation_group_inference(
            state, val,
            num_rotations=cfg.canonicalization.network_hyperparams.num_rotations,
        )

    if cfg.experiment.run_mode == "test":
        state = restore_checkpoint(
            cfg.checkpoint.checkpoint_path, state,
            strict=cfg.checkpoint.strict_loading,
        )
        print({k: float(v) for k, v in group_sweep(state, 777).items()})
        return

    logger = MetricLogger(None)
    saver = (
        best_metric_saver(cfg.checkpoint.checkpoint_path)
        if cfg.checkpoint.checkpoint_path
        else None
    )
    for epoch in range(cfg.experiment.num_epochs):
        for i in range(10):
            b = synthetic_coco_batch(jax.random.fold_in(rng, epoch * 100 + i), 4,
                                     image_size=size)
            state, metrics = step(state, b, rng)
            logger.update(metrics)
        print(f"epoch {epoch}: {logger.flush(epoch)}")
        if saver is not None:
            # monitor the aggregated group mAP (reference ModelCheckpoint
            # monitors val mAP, train_utils analog)
            gm = group_sweep(state, 10_000 + epoch)
            saver.maybe_save(float(gm["test/group_map"]), state, cfg)

    print({k: float(v) for k, v in group_sweep(state, 777).items()})


if __name__ == "__main__":
    main(sys.argv[1:])
