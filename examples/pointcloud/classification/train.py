"""Point-cloud classification training CLI.

TPU-native analog of reference examples/pointcloud/classification/train.py.
Uses ModelNet40 HDF5 if present under dataset.data_path, else the synthetic
ellipsoid task. Test-time rotation robustness (z / so3) mirrors the
reference's pytorch3d-based maybe_transform_points (reference
examples/pointcloud/classification/model.py:44-69); run_mode=test restores
the canonicalization config and weights from the checkpoint like the image
CLI (reference train.py:15-33).

    python examples/pointcloud/classification/train.py \
        prediction.architecture=pointnet experiment.num_epochs=2
"""

from __future__ import annotations

import os
import sys
from functools import partial

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
from equiadapt_tpu.utils.checkpoint import (
    best_metric_saver,
    restore_checkpoint,
    restore_config,
)
from equiadapt_tpu.utils.metrics import MetricLogger


def _modelnet_splits(cfg: Config):
    """(train, test) ModelNet40 dicts if the HDF5 tree exists, else None."""
    root = os.path.join(cfg.dataset.data_path, "modelnet40_ply_hdf5_2048")
    if cfg.dataset.dataset_name != "modelnet40" or not os.path.isdir(root):
        return None
    from equiadapt_tpu.data.pointcloud import load_modelnet40

    return load_modelnet40(cfg.dataset.data_path, cfg.dataset.num_points)


def get_batches(cfg: Config, rng, split_data, num_batches: int, epoch: int):
    """Shuffled minibatches from the loaded split, or synthetic draws."""
    bs = cfg.experiment.batch_size
    if split_data is not None:
        n = split_data["points"].shape[0]
        perm = jax.random.permutation(jax.random.fold_in(rng, epoch), n)
        for i in range(min(num_batches, n // bs)):
            idx = perm[i * bs : (i + 1) * bs]
            yield {k: v[idx] for k, v in split_data.items()}
    else:
        for i in range(num_batches):
            yield synthetic_pointcloud_batch(
                jax.random.fold_in(rng, epoch * 10_000 + i), bs,
                num_points=cfg.dataset.num_points,
                num_classes=cfg.dataset.num_classes,
            )


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
    nc = cfg.dataset.num_classes

    data = _modelnet_splits(cfg)
    train_data, test_data = data if data is not None else (None, None)
    if data is not None:
        nc = int(train_data["label"].max()) + 1

    canon = get_pointcloud_canonicalizer(cfg.canonicalization)
    pred = get_pointcloud_prediction_network(cfg.prediction.architecture, nc)
    pipe = PointcloudClassificationPipeline(canonicalizer=canon, prediction_network=pred)

    sample = next(get_batches(cfg, rng, train_data, 1, 0))
    tx = optax.adamw(cfg.experiment.learning_rate)
    state = create_pointcloud_state(pipe, rng, (sample["points"],), tx)
    step = make_pointcloud_train_step(num_classes=nc, train_rotation="z")

    @partial(jax.jit, static_argnames="rotation")
    def eval_step(state, points, label, rot_rng, rotation: str):
        pts = points if rotation == "none" else random_rotate(rot_rng, points, rotation)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        logits, _ = state.apply_fn(variables, pts, training=False)
        return classification_metrics(logits, label, nc)

    def robustness_eval(state, batch, rng):
        """Accuracy under none / z / so3 test-time rotations (the
        reference's maybe_transform_points sweep)."""
        out = {}
        for fold, mode in enumerate(("none", "z", "so3")):
            m = eval_step(state, batch["points"], batch["label"],
                          jax.random.fold_in(rng, fold), mode)
            out[f"test/acc_{mode}"] = float(m["metric/acc"])
        return out

    def val_batch(epoch: int):
        if test_data is not None:
            bs = min(cfg.experiment.batch_size, test_data["points"].shape[0])
            return {k: v[:bs] for k, v in test_data.items()}
        return synthetic_pointcloud_batch(
            jax.random.fold_in(rng, 99_999), cfg.experiment.batch_size,
            num_points=cfg.dataset.num_points, num_classes=nc,
        )

    if cfg.experiment.run_mode == "test":
        state = restore_checkpoint(
            cfg.checkpoint.checkpoint_path, state,
            strict=cfg.checkpoint.strict_loading,
        )
        print(robustness_eval(state, val_batch(0), jax.random.fold_in(rng, 7)))
        return

    logger = MetricLogger(None)
    saver = (
        best_metric_saver(cfg.checkpoint.checkpoint_path)
        if cfg.checkpoint.checkpoint_path
        else None
    )
    steps = 20 if train_data is None else 10**9  # real data: full epoch
    for epoch in range(cfg.experiment.num_epochs):
        for batch in get_batches(cfg, rng, train_data, steps, epoch):
            state, metrics = step(state, batch, rng)
            logger.update(metrics)
        val = val_batch(epoch)
        vm = eval_step(state, val["points"], val["label"],
                       jax.random.fold_in(rng, epoch), "z")
        acc = float(vm["metric/acc"])
        print(f"epoch {epoch}: {logger.flush(epoch)} val z-rot acc={acc:.4f}")
        if saver is not None:
            saver.maybe_save(acc, state, cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
