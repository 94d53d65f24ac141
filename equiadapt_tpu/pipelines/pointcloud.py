"""Point-cloud classification / part-segmentation pipelines.

TPU-native rebuild of reference examples/pointcloud/classification/
model.py:22-300 and part_segmentation/model.py:43+, plus the augmentations
from examples/pointcloud/common/utils.py:82-137 (random point dropout,
anisotropic scale, shift) and the pytorch3d-based random z/SO(3) test-time
rotations (classification/model.py:44-69) — all as pure jax.random
functions batched on device.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from equiadapt_tpu.common.info import (
    IdentityCanonicalizationInfo,
    prior_regularization_loss,
)
from equiadapt_tpu.common.lie import son_rep
from equiadapt_tpu.pipelines.classification import TrainState

Array = jnp.ndarray

__all__ = [
    "random_rotate",
    "random_point_dropout",
    "random_scale_shift",
    "PointcloudClassificationPipeline",
    "PointcloudPartSegPipeline",
    "make_pointcloud_train_step",
    "create_pointcloud_state",
]


def random_rotate(rng: jax.Array, points: Array, mode: str) -> Array:
    """Random z-axis or full SO(3) rotation per cloud
    (reference maybe_transform_points, classification/model.py:44-69)."""
    B = points.shape[0]
    if mode == "z":
        theta = jax.random.uniform(rng, (B,)) * 2 * jnp.pi
        c, s = jnp.cos(theta), jnp.sin(theta)
        zero, one = jnp.zeros_like(c), jnp.ones_like(c)
        R = jnp.stack(
            [c, -s, zero, s, c, zero, zero, zero, one], axis=-1
        ).reshape(B, 3, 3)
    elif mode == "so3":
        R = son_rep(jax.random.normal(rng, (B, 3)) * jnp.pi, 3)
    else:
        return points
    return jnp.einsum("bnd,bdw->bnw", points, R)


def random_point_dropout(
    rng: jax.Array, points: Array, max_dropout_ratio: float = 0.875
) -> Array:
    """Replace dropped points by the first point (shape-static dropout,
    reference common/utils.py random_point_dropout)."""
    r1, r2 = jax.random.split(rng)
    B, N, _ = points.shape
    ratio = jax.random.uniform(r1, (B, 1)) * max_dropout_ratio
    drop = jax.random.uniform(r2, (B, N)) <= ratio
    first = points[:, :1, :]
    return jnp.where(drop[..., None], first, points)


def random_scale_shift(
    rng: jax.Array,
    points: Array,
    scale_low: float = 0.8,
    scale_high: float = 1.25,
    shift_range: float = 0.1,
) -> Array:
    """Anisotropic scale + translation (reference common/utils.py
    random_scale_point_cloud / shift_point_cloud)."""
    r1, r2 = jax.random.split(rng)
    B = points.shape[0]
    scale = jax.random.uniform(r1, (B, 1, 3), minval=scale_low, maxval=scale_high)
    shift = jax.random.uniform(r2, (B, 1, 3), minval=-shift_range, maxval=shift_range)
    return points * scale + shift


class PointcloudClassificationPipeline(nn.Module):
    """canonicalize -> classify (reference classification/model.py:22-300)."""

    canonicalizer: nn.Module
    prediction_network: nn.Module

    @nn.compact
    def __call__(self, points: Array, training: bool = False):
        points_c, info = self.canonicalizer(points, training=training)
        logits = self.prediction_network(points_c, training=training)
        return logits, info


class PointcloudPartSegPipeline(nn.Module):
    """canonicalize -> per-point part logits with class conditioning
    (reference part_segmentation/model.py:43+)."""

    canonicalizer: nn.Module
    prediction_network: nn.Module

    @nn.compact
    def __call__(self, points: Array, category_onehot: Array, training: bool = False):
        points_c, info = self.canonicalizer(points, training=training)
        logits = self.prediction_network(points_c, category_onehot, training=training)
        return logits, info


def classification_metrics(logits: Array, labels: Array, num_classes: int):
    pred = jnp.argmax(logits, -1)
    acc = jnp.mean((pred == labels).astype(jnp.float32))
    onehot = jax.nn.one_hot(labels, num_classes)
    correct = onehot * (pred == labels).astype(jnp.float32)[:, None]
    per_class = jnp.sum(correct, 0) / jnp.maximum(jnp.sum(onehot, 0), 1.0)
    present = (jnp.sum(onehot, 0) > 0).astype(jnp.float32)
    balanced = jnp.sum(per_class * present) / jnp.maximum(jnp.sum(present), 1.0)
    return {"metric/acc": acc, "metric/balanced_acc": balanced}


def create_pointcloud_state(
    pipeline: nn.Module,
    rng: jax.Array,
    sample: Tuple,
    tx: optax.GradientTransformation,
) -> TrainState:
    variables = pipeline.init({"params": rng}, *sample, training=False)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=tx.init(variables["params"]),
        tx=tx,
        apply_fn=pipeline.apply,
    )


def make_pointcloud_train_step(
    *,
    num_classes: int,
    prior_weight: float = 1.0,
    label_smoothing: float = 0.0,
    train_rotation: str = "z",
    augment: bool = True,
    jit: bool = True,
):
    """Training step: augment -> canonicalize -> classify -> CE + prior
    (reference classification/model.py:71-161)."""

    def train_step(state: TrainState, batch: Dict[str, Array], rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        r_rot, r_drop, r_scale, r_drp = jax.random.split(rng, 4)
        pts = random_rotate(r_rot, batch["points"], train_rotation)
        if augment:
            pts = random_point_dropout(r_drop, pts)
            pts = random_scale_shift(r_scale, pts)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            (logits, info), new_state = state.apply_fn(
                variables, pts, training=True,
                rngs={"dropout": r_drp},
                mutable=["batch_stats"],
            )
            labels = batch["label"]
            if label_smoothing:
                oh = jax.nn.one_hot(labels, num_classes)
                soft = oh * (1 - label_smoothing) + label_smoothing / num_classes
                task = jnp.mean(optax.softmax_cross_entropy(logits, soft))
            else:
                task = jnp.mean(
                    optax.softmax_cross_entropy_with_integer_labels(logits, labels)
                )
            loss = task
            metrics = {"loss/task": task}
            if prior_weight and not isinstance(info, IdentityCanonicalizationInfo):
                prior = prior_regularization_loss(info)
                loss = loss + prior_weight * prior
                metrics["loss/prior"] = prior
            metrics.update(classification_metrics(logits, labels, num_classes))
            metrics["loss/total"] = loss
            metrics["loss/finite"] = jnp.isfinite(loss).astype(jnp.float32)
            return loss, (metrics, new_state.get("batch_stats", state.batch_stats))

        (loss, (metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=0) if jit else train_step
