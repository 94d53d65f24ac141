"""ShapeNet-Part point-cloud part-segmentation training CLI.

TPU-native analog of reference examples/pointcloud/part_segmentation/
train.py + model.py:43+. Uses local ShapeNet-Part HDF5 if present under
dataset.data_path, else a synthetic task (parts = octants of the
canonicalized cloud). run_mode=test restores the canonicalization config
and weights from the checkpoint (reference train.py:15-33 semantics).

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
from equiadapt_tpu.utils.checkpoint import (
    best_metric_saver,
    restore_checkpoint,
    restore_config,
)
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


def _shapenet_splits(cfg: Config):
    """(train, test) ShapeNet-Part dicts if the HDF5 tree exists, else None."""
    root = os.path.join(cfg.dataset.data_path, "shapenet_part_seg_hdf5_data")
    if not os.path.isdir(root):
        return None
    from equiadapt_tpu.data.pointcloud import load_shapenet_part

    return (
        load_shapenet_part(cfg.dataset.data_path, "train", cfg.dataset.num_points),
        load_shapenet_part(cfg.dataset.data_path, "test", cfg.dataset.num_points),
    )


def main(argv) -> None:
    cfg = compose_config(
        argv,
        config_dir=os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs"),
        base=[
            "canonicalization.canonicalization_type=continuous_group",
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

    data = _shapenet_splits(cfg)
    if data is not None:
        train_data, test_data = data
        # ShapeNet-Part: 16 object categories, 50 part classes
        num_parts = int(train_data["part_label"].max()) + 1
        num_cats = int(train_data["category"].max()) + 1
    else:
        train_data = test_data = None
        num_parts, num_cats = 8, 4

    canon = get_pointcloud_canonicalizer(cfg.canonicalization)
    pred = DGCNNPartSeg(num_parts=num_parts, num_categories=num_cats, k=8, emb_dims=128)
    pipe = PointcloudPartSegPipeline(canonicalizer=canon, prediction_network=pred)

    def get_batch(fold: int, split=None):
        if split is not None:
            bs = min(8, split["points"].shape[0])
            idx = jax.random.randint(
                jax.random.fold_in(rng, fold), (bs,), 0, split["points"].shape[0]
            )
            return {k: jnp.asarray(v)[idx] for k, v in split.items()}
        return synthetic_partseg_batch(jax.random.fold_in(rng, fold), 8,
                                       num_points=min(cfg.dataset.num_points, 256),
                                       num_categories=num_cats)

    sample = get_batch(0, train_data)
    cat_oh = jax.nn.one_hot(sample["category"], num_cats)
    tx = optax.adamw(cfg.experiment.learning_rate)
    state = create_pointcloud_state(pipe, rng, (sample["points"], cat_oh), tx)

    def eval_metrics(logits, part_label):
        acc = jnp.mean((jnp.argmax(logits, -1) == part_label).astype(jnp.float32))
        pred_cls = jnp.argmax(logits, -1)
        ious = []
        for p in range(num_parts):
            inter = jnp.sum((pred_cls == p) & (part_label == p))
            union = jnp.sum((pred_cls == p) | (part_label == p))
            ious.append(inter / jnp.maximum(union, 1))
        return acc, jnp.mean(jnp.stack(ious))

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
            acc, miou = eval_metrics(logits, batch["part_label"])
            return loss, (
                {"loss/total": loss, "metric/acc": acc, "metric/miou": miou},
                new_state.get("batch_stats", state.batch_stats),
            )

        (loss, (metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return state.apply_gradients(grads).replace(batch_stats=new_bs), metrics

    @jax.jit
    def eval_step(state, batch):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        oh = jax.nn.one_hot(batch["category"], num_cats)
        logits, _ = state.apply_fn(variables, batch["points"], oh, training=False)
        acc, miou = eval_metrics(logits, batch["part_label"])
        return {"test/acc": acc, "test/miou": miou}

    if cfg.experiment.run_mode == "test":
        state = restore_checkpoint(
            cfg.checkpoint.checkpoint_path, state,
            strict=cfg.checkpoint.strict_loading,
        )
        vm = eval_step(state, get_batch(777, test_data))
        print({k: float(v) for k, v in vm.items()})
        return

    logger = MetricLogger(None)
    saver = (
        best_metric_saver(cfg.checkpoint.checkpoint_path)
        if cfg.checkpoint.checkpoint_path
        else None
    )
    for epoch in range(cfg.experiment.num_epochs):
        for i in range(10):
            state, metrics = step(state, get_batch(epoch * 100 + i, train_data), rng)
            logger.update(metrics)
        vm = eval_step(state, get_batch(10_000 + epoch, test_data))
        miou = float(vm["test/miou"])
        print(f"epoch {epoch}: {logger.flush(epoch)} val miou={miou:.4f}")
        if saver is not None:
            saver.maybe_save(miou, state, cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
