"""Instance-segmentation training CLI (prior-regularized promptable model).

TPU-native analog of reference examples/images/segmentation/train.py: the
canonicalizer is trained with prior regularization while adapting a
promptable segmentation model (SAMLite here; convert a local SAM checkpoint
to go full-scale). Uses the synthetic COCO-style rectangles task when no
local COCO is present (zero egress).

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
    Config,
    compose_config,
    get_image_canonicalization_network,
    get_image_canonicalizer,
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

    logger = MetricLogger(None)
    for epoch in range(cfg.experiment.num_epochs):
        for i in range(10):
            b = synthetic_coco_batch(jax.random.fold_in(rng, epoch * 100 + i), 4,
                                     image_size=size)
            state, metrics = step(state, b, rng)
            logger.update(metrics)
        print(f"epoch {epoch}: {logger.flush(epoch)}")

    val = synthetic_coco_batch(jax.random.fold_in(rng, 777), 4, image_size=size)
    gm = segmentation_group_inference(
        state, val,
        num_rotations=cfg.canonicalization.network_hyperparams.num_rotations,
    )
    print({k: float(v) for k, v in gm.items()})


if __name__ == "__main__":
    main(sys.argv[1:])
