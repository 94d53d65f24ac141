"""Instance-segmentation stack tests: SAMLite forward, losses, joint
image+target canonicalization, mask invert, and a training step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from equiadapt_tpu.images import (
    EquivariantNetwork,
    GroupEquivariantImageCanonicalization,
)
from equiadapt_tpu.models.segmentation import SAMLite, calc_iou, dice_loss, focal_loss
from equiadapt_tpu.pipelines.segmentation import (
    ImageSegmentationPipeline,
    create_segmentation_state,
    make_segmentation_train_step,
    mask_iou_map_metric,
    segmentation_task_loss,
)

KEY = jax.random.key(0)


def _batch(b=2, size=64, n_prompts=3, seed=0):
    rng = np.random.default_rng(seed)
    images = jnp.asarray(rng.normal(size=(b, size, size, 3)).astype(np.float32))
    x1 = rng.uniform(4, size // 2, size=(b, n_prompts))
    y1 = rng.uniform(4, size // 2, size=(b, n_prompts))
    boxes = np.stack([x1, y1, x1 + size // 4, y1 + size // 4], axis=-1)
    masks = np.zeros((b, n_prompts, size, size), np.float32)
    for i in range(b):
        for j in range(n_prompts):
            xa, ya, xb, yb = boxes[i, j].astype(int)
            masks[i, j, ya:yb, xa:xb] = 1.0
    valid = np.ones((b, n_prompts), np.float32)
    labels = rng.integers(0, 10, size=(b, n_prompts))
    return {
        "image": images,
        "targets": {
            "boxes": jnp.asarray(boxes.astype(np.float32)),
            "masks": jnp.asarray(masks),
            "labels": jnp.asarray(labels),
            "valid": jnp.asarray(valid),
        },
    }


def test_losses_and_iou():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(2, 3, 16, 16)).astype(np.float32))
    gt = (jnp.asarray(rng.normal(size=(2, 3, 16, 16))) > 0).astype(jnp.float32)
    f = float(focal_loss(logits, gt))
    d = float(dice_loss(logits, gt))
    assert np.isfinite(f) and f >= 0
    assert 0 <= d <= 1
    iou = calc_iou(logits, gt)
    assert iou.shape == (2, 3)
    assert np.all((np.asarray(iou) >= 0) & (np.asarray(iou) <= 1))
    # perfect prediction -> iou 1, dice ~0
    perfect = (gt * 2 - 1) * 20.0
    np.testing.assert_allclose(np.asarray(calc_iou(perfect, gt)), 1.0)
    assert float(dice_loss(perfect, gt)) < 0.01


def test_samlite_forward_shapes():
    m = SAMLite(embed_dim=64, encoder_depth=1, decoder_depth=1, num_heads=2)
    b = _batch(size=64)
    params = m.init(KEY, b["image"], b["targets"]["boxes"])
    masks, ious = m.apply(params, b["image"], b["targets"]["boxes"])
    assert masks.shape == (2, 3, 64, 64)
    assert ious.shape == (2, 3)
    assert np.isfinite(np.asarray(masks)).all()


def test_segmentation_pipeline_train_step():
    net = EquivariantNetwork(
        in_channels=3, out_channels=4, kernel_size=3, group_type="rotation",
        num_rotations=4, num_layers=2,
    )
    canon = GroupEquivariantImageCanonicalization(
        canonicalization_network=net, in_shape=(64, 64, 3), num_rotations=4,
    )
    sam = SAMLite(embed_dim=32, encoder_depth=1, decoder_depth=1, num_heads=2)
    pipe = ImageSegmentationPipeline(canonicalizer=canon, prediction_network=sam)
    b = _batch(size=64)
    tx = optax.adam(1e-3)
    state = create_segmentation_state(pipe, KEY, b["image"], b["targets"], tx)
    step = make_segmentation_train_step(prior_weight=1.0)
    state, metrics = step(state, b, jax.random.key(1))
    for k in ("loss/focal", "loss/dice", "loss/iou_mse", "loss/prior", "loss/total"):
        assert np.isfinite(float(metrics[k])), k

    # invert predicted masks back to the input frame
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    ((_, _, pred_masks, _), info) = pipe.apply(variables, b["image"], b["targets"])
    back = pipe.invert_masks(info, pred_masks)
    assert back.shape == pred_masks.shape


def test_mask_map_metric():
    gt = jnp.ones((2, 3, 8, 8))
    pred = jnp.full((2, 3, 8, 8), 10.0)
    valid = jnp.ones((2, 3))
    m = float(mask_iou_map_metric(pred, jnp.ones((2, 3)), gt, valid))
    np.testing.assert_allclose(m, 1.0)
