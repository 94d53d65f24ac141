"""MaskRCNNLite: static-shape detection + instance masks for segmentation.

TPU-native counterpart of the reference's MaskRCNN prediction network
(reference examples/images/segmentation/model_utils.py:14-97 wraps
torchvision maskrcnn_resnet50_fpn: train-time internal loss dict, eval-time
detections, empty-prediction fallback). A faithful two-stage RPN/NMS/ROIAlign
pipeline is jit-hostile (dynamic shapes everywhere); this is the TPU-first
redesign with the same pipeline contract:

* ResNet backbone + FPN-lite neck;
* dense anchor-free detection head (FCOS-style): per-location objectness,
  class logits and distance-to-edges box regression — all static shapes;
* `lax.top_k` proposal selection (static K — the "empty prediction"
  fallback becomes scores ~ 0 for unused slots, no host branching);
* mask head: predicted (or ground-truth at training) boxes prompt the same
  two-way decoder used by SAMLite, so the mask path is shared and batched
  over instances.

Train-time losses (`maskrcnn_lite_loss`) mirror the torchvision dict:
objectness (focal), box regression (IoU loss on matched centers),
classification (CE) and mask (focal+dice via the segmentation pipeline).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from equiadapt_tpu.models.segmentation import MaskDecoderLite, PromptEncoderLite, dice_loss, focal_loss

Array = jnp.ndarray

__all__ = ["MaskRCNNLite", "maskrcnn_lite_loss", "decode_boxes"]


def decode_boxes(centers: Array, ltrb: Array) -> Array:
    """(cx, cy) + (l, t, r, b) distances -> xyxy boxes."""
    cx, cy = centers[..., 0], centers[..., 1]
    l, t, r, b = ltrb[..., 0], ltrb[..., 1], ltrb[..., 2], ltrb[..., 3]
    return jnp.stack([cx - l, cy - t, cx + r, cy + b], axis=-1)


class _FPNLite(nn.Module):
    """Two-level feature pyramid from backbone stages."""

    channels: int = 128

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        h = nn.Conv(64, (3, 3), (2, 2), padding=1)(x)
        h = nn.BatchNorm(use_running_average=not training)(h)
        h = nn.relu(h)
        c3 = nn.Conv(self.channels, (3, 3), (2, 2), padding=1)(h)
        c3 = nn.relu(c3)
        c4 = nn.Conv(self.channels, (3, 3), (2, 2), padding=1)(c3)
        c4 = nn.relu(c4)
        # top-down merge back to stride 8
        up = jax.image.resize(c4, c3.shape, method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1)(c3 + up)


class MaskRCNNLite(nn.Module):
    """Detector + promptable mask head with static top-K instances."""

    num_classes: int = 91
    max_instances: int = 8
    channels: int = 128
    decoder_depth: int = 1
    num_heads: int = 4
    # "lite": the small from-scratch conv trunk. "resnet50": torchvision-
    # layout ResNet-50 trunk (stages C3/C4 + lateral FPN merge) whose
    # `backbone` params subtree accepts converted pretrained weights
    # (models/convert.py; the reference's maskrcnn_resnet50_fpn backbone,
    # segmentation/model_utils.py:14-36)
    backbone: str = "lite"
    # torchvision box_score_thresh analog: detections below it are zeroed
    # (the reference wrapper's empty-prediction fallback,
    # model_utils.py:74-97, done branch-free with a validity mask)
    score_threshold: float = 0.05

    @nn.compact
    def __call__(
        self,
        images: Array,
        boxes: Optional[Array] = None,
        training: bool = False,
    ):
        """images: (B, H, W, 3); boxes: optional (B, N, 4) GT prompts.

        Returns dict with dense head outputs (for losses), top-K detections
        (boxes, scores, labels) and instance mask logits at image resolution.
        Mask prompts are GT boxes when given (training), else the top-K
        predicted boxes (inference) — the analog of torchvision's
        train/eval mode split.
        """
        B, H, W, _ = images.shape
        if self.backbone == "resnet50":
            from equiadapt_tpu.models.resnet import ResNet50

            stages = ResNet50(
                num_classes=None, return_stages=True, name="backbone"
            )(images, training=training)
            c3, c4 = stages[1], stages[2]  # strides 8 / 16
            p3 = nn.Conv(self.channels, (1, 1))(c3)
            p4 = nn.Conv(self.channels, (1, 1))(c4)
            up = jax.image.resize(p4, p3.shape, method="nearest")
            feat = nn.Conv(self.channels, (3, 3), padding=1)(p3 + up)
        else:
            feat = _FPNLite(channels=self.channels)(images, training=training)  # (B, h, w, C)
        h, w = feat.shape[1], feat.shape[2]
        stride = H // h

        head = feat
        for _ in range(2):
            head = nn.Conv(self.channels, (3, 3), padding=1)(head)
            head = nn.relu(head)
        obj_logits = nn.Conv(1, (3, 3), padding=1)(head)[..., 0]  # (B, h, w)
        cls_logits = nn.Conv(self.num_classes, (3, 3), padding=1)(head)
        ltrb = nn.relu(nn.Conv(4, (3, 3), padding=1)(head)) * stride * 4.0

        ys = (jnp.arange(h) + 0.5) * stride
        xs = (jnp.arange(w) + 0.5) * stride
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        centers = jnp.stack([gx, gy], axis=-1)  # (h, w, 2)
        dense_boxes = decode_boxes(centers[None], ltrb)  # (B, h, w, 4)

        # static top-K proposals (the NMS-free TPU selection)
        flat_obj = obj_logits.reshape(B, h * w)
        scores, idx = jax.lax.top_k(flat_obj, self.max_instances)
        det_boxes = jnp.take_along_axis(
            dense_boxes.reshape(B, h * w, 4), idx[..., None], axis=1
        )
        det_labels = jnp.argmax(
            jnp.take_along_axis(
                cls_logits.reshape(B, h * w, self.num_classes), idx[..., None], axis=1
            ),
            axis=-1,
        )

        prompts = boxes if boxes is not None else det_boxes
        sparse = PromptEncoderLite(embed_dim=self.channels)(prompts, (H, W))
        low_res, ious = MaskDecoderLite(
            embed_dim=self.channels, depth=self.decoder_depth, num_heads=self.num_heads
        )(feat, sparse, training=training)
        masks = jax.image.resize(
            low_res, (B, low_res.shape[1], H, W), method="linear"
        )

        # empty-prediction fallback: zero out detections below the score
        # threshold — torchvision-style, but static shapes (score-ranked
        # slots stay sorted because top_k returns descending scores)
        det_scores = jax.nn.sigmoid(scores)
        det_valid = (det_scores >= self.score_threshold).astype(det_scores.dtype)
        det_boxes = det_boxes * det_valid[..., None]
        det_labels = det_labels * det_valid.astype(det_labels.dtype)
        det_scores = det_scores * det_valid
        if boxes is None:
            masks = masks + jnp.where(
                det_valid[..., None, None] > 0, 0.0, -1e4
            ).astype(masks.dtype)

        return {
            "obj_logits": obj_logits,
            "cls_logits": cls_logits,
            "dense_boxes": dense_boxes,
            "det_boxes": det_boxes,
            "det_scores": det_scores,
            "det_labels": det_labels,
            "det_valid": det_valid,
            "pred_masks": masks,
            "ious": ious,
            "stride": stride,
        }


def _box_iou(a: Array, b: Array) -> Array:
    """IoU of aligned box arrays (..., 4)."""
    x1 = jnp.maximum(a[..., 0], b[..., 0])
    y1 = jnp.maximum(a[..., 1], b[..., 1])
    x2 = jnp.minimum(a[..., 2], b[..., 2])
    y2 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    area_a = jnp.clip(a[..., 2] - a[..., 0], 0) * jnp.clip(a[..., 3] - a[..., 1], 0)
    area_b = jnp.clip(b[..., 2] - b[..., 0], 0) * jnp.clip(b[..., 3] - b[..., 1], 0)
    return inter / jnp.maximum(area_a + area_b - inter, 1e-6)


def maskrcnn_lite_loss(
    outputs: Dict[str, Array], targets: Dict[str, Array]
) -> Tuple[Array, Dict[str, Array]]:
    """Dense detection + mask losses (the torchvision loss-dict analog).

    Matching: each GT instance is assigned to the feature location containing
    its center (center sampling, the FCOS simplification of RPN matching).
    """
    obj = outputs["obj_logits"]  # (B, h, w)
    B, h, w = obj.shape
    stride = outputs["stride"]
    boxes = targets["boxes"]  # (B, N, 4)
    valid = targets["valid"]  # (B, N)

    cx = (boxes[..., 0] + boxes[..., 2]) / 2.0
    cy = (boxes[..., 1] + boxes[..., 3]) / 2.0
    ix = jnp.clip((cx / stride).astype(jnp.int32), 0, w - 1)
    iy = jnp.clip((cy / stride).astype(jnp.int32), 0, h - 1)
    flat_idx = iy * w + ix  # (B, N)

    # objectness target grid: scatter 1s at instance centers
    obj_t = jnp.zeros((B, h * w))
    obj_t = jax.vmap(lambda t, i, v: t.at[i].max(v))(obj_t, flat_idx, valid)
    obj_loss = focal_loss(obj.reshape(B, h * w), obj_t)

    # box regression at matched centers
    pred_boxes = jnp.take_along_axis(
        outputs["dense_boxes"].reshape(B, h * w, 4), flat_idx[..., None], axis=1
    )
    iou = _box_iou(pred_boxes, boxes)
    box_loss = jnp.sum((1.0 - iou) * valid) / jnp.maximum(valid.sum(), 1.0)

    # classification at matched centers
    pred_cls = jnp.take_along_axis(
        outputs["cls_logits"].reshape(B, h * w, -1), flat_idx[..., None], axis=1
    )
    labels = targets["labels"]
    cls_ce = -jax.nn.log_softmax(pred_cls, -1)
    cls_loss = jnp.sum(
        jnp.take_along_axis(cls_ce, labels[..., None], axis=-1)[..., 0] * valid
    ) / jnp.maximum(valid.sum(), 1.0)

    # mask losses on the prompted instances
    gt_masks = targets["masks"].astype(jnp.float32)
    vmask = valid[..., None, None]
    m_focal = focal_loss(outputs["pred_masks"] * vmask, gt_masks * vmask)
    m_dice = dice_loss(outputs["pred_masks"] * vmask - (1 - vmask) * 1e4, gt_masks * vmask)

    loss = obj_loss + box_loss + cls_loss + 20.0 * m_focal + m_dice
    return loss, {
        "loss/objectness": obj_loss,
        "loss/box_reg": box_loss,
        "loss/classifier": cls_loss,
        "loss/mask_focal": m_focal,
        "loss/mask_dice": m_dice,
        "loss/total": loss,
    }
