"""Instance-segmentation pipeline: joint image+target canonicalization.

TPU-native rebuild of reference examples/images/segmentation/model.py:13-297
and inference_utils.py:13-281. The canonicalizer transforms images AND
targets (boxes, masks) together — fully batched (the reference loops per
image, model.py:121 + discrete_group.py:217-236) — then a promptable
segmentation model predicts masks from the canonicalized boxes, and
predicted masks are mapped back by invert_canonicalization (scalar induced
rep). Task loss = 20*focal + dice + iou-MSE (reference apply_loss
model.py:58-106); prior regularization makes the frozen-model
(SAM) finetuning flow work.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from equiadapt_tpu.common.info import (
    IdentityCanonicalizationInfo,
    prior_regularization_loss,
)
from equiadapt_tpu.models.segmentation import calc_iou, dice_loss, focal_loss
from equiadapt_tpu.pipelines.classification import TrainState

Array = jnp.ndarray

__all__ = [
    "ImageSegmentationPipeline",
    "segmentation_task_loss",
    "make_segmentation_train_step",
    "create_segmentation_state",
    "mask_iou_map_metric",
    "mean_average_precision_segm",
]


class ImageSegmentationPipeline(nn.Module):
    """canonicalize(images, targets) -> promptable predict -> invert masks."""

    canonicalizer: nn.Module
    prediction_network: nn.Module  # e.g. models.segmentation.SAMLite

    @nn.compact
    def __call__(
        self,
        images: Array,
        targets: Dict[str, Array],
        training: bool = False,
    ):
        """images: (B, H, W, 3); targets: boxes (B, N, 4), masks (B, N, H, W),
        labels (B, N), valid (B, N) {0,1} prompt mask (static shapes with
        padded prompts — the TPU replacement for ragged per-image lists).
        """
        out = self.canonicalizer(images, targets, training=training)
        images_c, targets_c, info = out
        pred_masks, ious = self.prediction_network(
            images_c, targets_c["boxes"], training=training
        )
        return (images_c, targets_c, pred_masks, ious), info

    def invert_masks(self, info, masks: Array) -> Array:
        """Map predicted masks back to the input frame (scalar induced rep).
        masks: (B, N, H, W) -> same, un-canonicalized."""
        nhwc = jnp.moveaxis(masks, 1, -1)  # (B, H, W, N)
        out = self.canonicalizer.invert_canonicalization(
            info, nhwc, induced_rep_type="scalar"
        )
        return jnp.moveaxis(out, -1, 1)


def segmentation_task_loss(
    pred_masks: Array, ious: Array, targets: Dict[str, Array]
) -> Tuple[Array, Dict[str, Array]]:
    """20*focal + dice + MSE(iou_pred, iou(pred, gt)) over valid prompts
    (reference apply_loss, segmentation/model.py:58-106)."""
    gt = targets["masks"].astype(jnp.float32)
    valid = targets.get("valid")
    if valid is None:
        valid = jnp.ones(pred_masks.shape[:2], pred_masks.dtype)
    w = valid[..., None, None]
    # masked focal/dice: zero out padded prompts on both sides
    f = focal_loss(pred_masks * w, gt * w)
    d = dice_loss(pred_masks * w - (1 - w) * 1e4, gt * w)
    iou_gt = calc_iou(pred_masks, gt)
    iou_mse = jnp.sum(((ious - iou_gt) ** 2) * valid) / jnp.maximum(valid.sum(), 1.0)
    loss = 20.0 * f + d + iou_mse
    return loss, {
        "loss/focal": f,
        "loss/dice": d,
        "loss/iou_mse": iou_mse,
        "metric/mean_iou": jnp.sum(iou_gt * valid) / jnp.maximum(valid.sum(), 1.0),
    }


def create_segmentation_state(
    pipeline: ImageSegmentationPipeline,
    rng: jax.Array,
    sample_images: Array,
    sample_targets: Dict[str, Array],
    tx: optax.GradientTransformation,
) -> TrainState:
    variables = pipeline.init({"params": rng}, sample_images, sample_targets,
                              training=False)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=tx.init(variables["params"]),
        tx=tx,
        apply_fn=pipeline.apply,
    )


def make_segmentation_train_step(prior_weight: float = 100.0, jit: bool = True):
    """Prior-regularized finetuning step (the frozen-SAM adaptation flow,
    BASELINE.md config 5)."""

    def train_step(state: TrainState, batch: Dict[str, Any], rng: jax.Array):
        rngs = {"dropout": jax.random.fold_in(rng, state.step)}

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            ((_, targets_c, pred_masks, ious), info), new_state = state.apply_fn(
                variables, batch["image"], batch["targets"],
                training=True, rngs=rngs, mutable=["batch_stats"],
            )
            task, metrics = segmentation_task_loss(pred_masks, ious, targets_c)
            loss = task
            if prior_weight and not isinstance(info, IdentityCanonicalizationInfo):
                prior = prior_regularization_loss(info)
                loss = loss + prior_weight * prior
                metrics["loss/prior"] = prior
            metrics["loss/total"] = loss
            metrics["loss/finite"] = jnp.isfinite(loss).astype(jnp.float32)
            return loss, (metrics, new_state.get("batch_stats", state.batch_stats))

        (loss, (metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=0) if jit else train_step


def segmentation_group_inference(
    state: TrainState,
    batch: Dict[str, Any],
    *,
    num_rotations: int = 4,
    group_type: str = "rotation",
):
    """Per-group-element mAP sweep (reference segmentation
    inference_utils.py:119-264): transform image AND targets by each group
    element, run the pipeline, report per-element and aggregated map."""
    import numpy as onp

    from equiadapt_tpu.ops.boxes import flip_boxes, flip_masks, rotate_boxes, rotate_masks
    from equiadapt_tpu.ops.warp import _residual_rotate, hflip

    x = batch["image"]
    targets = batch["targets"]
    B, H, W, _ = x.shape
    degrees = onp.linspace(0.0, 360.0, num_rotations + 1)[:num_rotations]
    results = {}
    maps = []
    reflections = (0, 1) if group_type == "roto-reflection" else (0,)
    apply_jit = jax.jit(lambda v, xi, ti: state.apply_fn(v, xi, ti, training=False))
    for refl in reflections:
        for g in range(num_rotations):
            ang = jnp.full((B,), -float(degrees[g]))
            xi = hflip(x) if refl else x
            # the sweep angle is a trace-time constant: static-tap warp, not
            # the dynamic-gather path a traced angle would trigger
            xi = _residual_rotate(xi, -float(degrees[g]), "border", "exact")
            boxes = targets["boxes"]
            masks = targets["masks"]
            if refl:
                boxes = flip_boxes(boxes, W)
                masks = flip_masks(masks)
            boxes = rotate_boxes(boxes, -ang, W)
            masks = rotate_masks(masks, ang)
            ti = {**targets, "boxes": boxes, "masks": masks}
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            ((_, tc, pred_masks, ious), _info) = apply_jit(variables, xi, ti)
            m = mean_average_precision_segm(
                pred_masks, ious, tc["masks"], tc["valid"]
            )
            idx = g + refl * num_rotations
            results[f"test/map_element_{idx}"] = m
            maps.append(m)
    results["test/group_map"] = jnp.mean(jnp.stack(maps))
    results["test/map"] = maps[0]
    return results


def mask_iou_map_metric(
    pred_masks: Array,
    scores: Array,
    gt_masks: Array,
    valid: Array,
    thresholds=(0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95),
) -> Array:
    """Simplified segm mAP over IoU thresholds for matched (prompted)
    instances — a jit-friendly stand-in for torchmetrics
    MeanAveragePrecision(iou_type='segm') (reference model.py:206-238);
    prompts give the prediction<->gt matching for free."""
    ious = calc_iou(pred_masks, gt_masks.astype(jnp.float32))
    n = jnp.maximum(valid.sum(), 1.0)
    aps = [jnp.sum((ious > t) * valid) / n for t in thresholds]
    return jnp.mean(jnp.stack(aps))


def _pairwise_mask_iou(pred: Array, gt: Array) -> Array:
    """(B, Np, H, W) x (B, Ng, H, W) -> (B, Np, Ng) IoU of binarized masks."""
    p = (pred > 0.5).astype(jnp.float32).reshape(pred.shape[0], pred.shape[1], -1)
    g = (gt > 0.5).astype(jnp.float32).reshape(gt.shape[0], gt.shape[1], -1)
    inter = jnp.einsum("bpx,bgx->bpg", p, g)
    union = p.sum(-1)[:, :, None] + g.sum(-1)[:, None, :] - inter
    return inter / jnp.maximum(union, 1e-7)


def mean_average_precision_segm(
    pred_masks: Array,
    scores: Array,
    gt_masks: Array,
    valid: Array,
    thresholds=(0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95),
) -> Array:
    """COCO-style segm mAP: score-ranked greedy matching + 101-point
    interpolated AP, averaged over IoU thresholds — the semantics of
    torchmetrics MeanAveragePrecision(iou_type="segm") (reference
    examples/images/segmentation/model.py:206-238), single class.

    Fully static shapes (jit-friendly): predictions are globally sorted by
    score; a lax.scan walks them in rank order, greedily matching each to
    its image's best still-unmatched GT with IoU >= t; the TP sequence gives
    the precision/recall curve. Validated against an independent numpy
    implementation in tests/test_segmentation.py (exact on fixtures).

    Args:
        pred_masks: (B, N, H, W) predicted masks (probabilities or logits>0).
        scores: (B, N) confidence per prediction (higher = better).
        gt_masks: (B, N, H, W) ground-truth masks.
        valid: (B, N) 1 where the instance slot is real (applies to both
            predictions and GTs — padded prompt slots).
    """
    B, Np = scores.shape
    iou_mat = _pairwise_mask_iou(pred_masks, gt_masks)  # (B, Np, Ng)
    v = valid.astype(jnp.float32)
    flat_scores = jnp.where(v > 0, scores, -jnp.inf).reshape(-1)
    order = jnp.argsort(-flat_scores)  # global rank order
    img_of = order // Np
    slot_of = order % Np
    pred_valid = (v.reshape(-1)[order] > 0)
    n_gt = jnp.maximum(v.sum(), 1.0)
    recall_pts = jnp.linspace(0.0, 1.0, 101)

    def ap_at(t):
        def step(matched, idx):
            b, j, ok = img_of[idx], slot_of[idx], pred_valid[idx]
            cand = (
                (iou_mat[b, j] >= t)
                & (matched[b] < 0.5)
                & (v[b] > 0)
            )
            best = jnp.argmax(jnp.where(cand, iou_mat[b, j], -1.0))
            tp = cand.any() & ok
            matched = matched.at[b, best].add(
                jnp.where(tp, 1.0, 0.0)
            )
            return matched, tp.astype(jnp.float32)

        _, tps = jax.lax.scan(step, jnp.zeros_like(v), jnp.arange(B * Np))
        cum_tp = jnp.cumsum(tps)
        ranks = jnp.cumsum(pred_valid.astype(jnp.float32))
        precision = cum_tp / jnp.maximum(ranks, 1.0)
        recall = cum_tp / n_gt
        # 101-point interpolation: max precision at recall >= r
        prec_at = jnp.max(
            jnp.where(
                (recall[None, :] >= recall_pts[:, None])
                & pred_valid[None, :],
                precision[None, :],
                0.0,
            ),
            axis=1,
        )
        return jnp.mean(prec_at)

    return jnp.mean(jnp.stack([ap_at(t) for t in thresholds]))
