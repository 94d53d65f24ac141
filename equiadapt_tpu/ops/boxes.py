"""Batched box / mask group transforms for instance segmentation targets.

TPU-native, fully batched replacement for reference
equiadapt/images/utils.py:97-187 (`flip_boxes`, `flip_masks`, `rotate_masks`,
`rotate_points`, `rotate_boxes`). The reference applies these inside a Python
loop over the batch (discrete_group.py:217-236) — here every op is vectorized
over (B, N, ...) so target co-canonicalization stays inside the single jit.

Boxes are xyxy in pixel coordinates. Masks are (..., H, W) bitmaps (NHW...C
handled by the caller); mask rotation reuses the shared bilinear `rotate`.
"""

from __future__ import annotations

import jax.numpy as jnp

from equiadapt_tpu.ops.warp import rotate

Array = jnp.ndarray

__all__ = ["flip_boxes", "flip_masks", "rotate_points", "rotate_boxes", "rotate_masks"]


def flip_boxes(boxes: Array, width: float) -> Array:
    """Horizontal flip of xyxy boxes (reference images/utils.py:97-109).

    Args:
        boxes: (..., 4).
    """
    x1, y1, x2, y2 = jnp.moveaxis(boxes, -1, 0)
    return jnp.stack([width - x2, y1, width - x1, y2], axis=-1)


def flip_masks(masks: Array) -> Array:
    """Horizontal flip of (..., H, W) masks (reference images/utils.py:112-122)."""
    return masks[..., ::-1]


def rotate_points(origin, px: Array, py: Array, angle_rad: Array):
    """Rotate points about an origin (reference images/utils.py:139-158).

    angle_rad broadcasts against the point arrays.
    """
    ox, oy = origin
    c = jnp.cos(angle_rad)
    s = jnp.sin(angle_rad)
    qx = ox + c * (px - ox) - s * (py - oy)
    qy = oy + s * (px - ox) + c * (py - oy)
    return qx, qy


def rotate_boxes(boxes: Array, angle_deg: Array, width: float) -> Array:
    """Rotate xyxy boxes and re-axis-align (reference images/utils.py:161-187).

    Rotates the (min, min) and (max, max) corners about the image center and
    takes coordinate-wise min/max — exactly the reference's (lossy)
    re-axis-alignment.

    Args:
        boxes: (B, N, 4) or (N, 4).
        angle_deg: broadcastable per-box/per-batch angle in degrees.
    """
    origin = (width / 2.0, width / 2.0)
    rad = jnp.deg2rad(angle_deg)
    if boxes.ndim == 3 and jnp.ndim(rad) == 1:
        rad = rad[:, None]
    x1, y1, x2, y2 = jnp.moveaxis(boxes, -1, 0)
    xmin_r, ymin_r = rotate_points(origin, x1, y1, rad)
    xmax_r, ymax_r = rotate_points(origin, x2, y2, rad)
    xlo = jnp.minimum(xmin_r, xmax_r)
    xhi = jnp.maximum(xmin_r, xmax_r)
    ylo = jnp.minimum(ymin_r, ymax_r)
    yhi = jnp.maximum(ymin_r, ymax_r)
    return jnp.stack([xlo, ylo, xhi, yhi], axis=-1)


def rotate_masks(masks: Array, angle_deg: Array) -> Array:
    """Rotate (B, N, H, W) masks by per-batch angles.

    The reference uses torchvision rotate per sample (images/utils.py:125-136);
    here the N mask channel folds into the channel axis of one batched
    bilinear rotate (zeros fill).
    """
    B, N, H, W = masks.shape
    nhwc = jnp.moveaxis(masks, 1, -1)  # (B, H, W, N)
    out = rotate(nhwc, angle_deg, padding_mode="zeros")
    return jnp.moveaxis(out, -1, 1)
