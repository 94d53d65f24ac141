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


@pytest.mark.slow
def test_samlite_forward_shapes():
    m = SAMLite(embed_dim=32, encoder_depth=1, decoder_depth=1, num_heads=2,
                patch_size=8)
    b = _batch(size=32)
    params = m.init(KEY, b["image"], b["targets"]["boxes"])
    masks, ious = m.apply(params, b["image"], b["targets"]["boxes"])
    assert masks.shape == (2, 3, 32, 32)
    assert ious.shape == (2, 3)
    assert np.isfinite(np.asarray(masks)).all()


@pytest.mark.slow
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


def _numpy_coco_ap(pred_masks, scores, gt_masks, valid, thresholds):
    """Independent reference: COCO/torchmetrics-style single-class segm AP
    (score-ranked greedy matching, 101-point interpolated precision)."""
    import numpy as np

    B, N = scores.shape
    preds = []  # (score, b, iou_row)
    gts = {b: [] for b in range(B)}
    for b in range(B):
        for j in range(N):
            if valid[b, j] > 0:
                gts[b].append(j)
    for b in range(B):
        for j in range(N):
            if valid[b, j] > 0:
                p = (pred_masks[b, j] > 0.5).astype(np.float64)
                row = {}
                for g in gts[b]:
                    q = (gt_masks[b, g] > 0.5).astype(np.float64)
                    inter = (p * q).sum()
                    union = p.sum() + q.sum() - inter
                    row[g] = inter / max(union, 1e-7)
                preds.append((scores[b, j], b, row))
    preds.sort(key=lambda t: -t[0])
    n_gt = sum(len(v) for v in gts.values())
    aps = []
    for t in thresholds:
        matched = {b: set() for b in range(B)}
        tps = []
        for s, b, row in preds:
            cands = [(iou, g) for g, iou in row.items()
                     if iou >= t and g not in matched[b]]
            if cands:
                iou, g = max(cands)
                matched[b].add(g)
                tps.append(1.0)
            else:
                tps.append(0.0)
        tps = np.asarray(tps)
        cum = np.cumsum(tps)
        prec = cum / np.arange(1, len(tps) + 1)
        rec = cum / max(n_gt, 1)
        ap = 0.0
        for r in np.linspace(0, 1, 101):
            ok = rec >= r
            ap += prec[ok].max() if ok.any() else 0.0
        aps.append(ap / 101)
    return float(np.mean(aps))


def test_mean_average_precision_matches_numpy_coco_reference():
    """mean_average_precision_segm == the independent numpy COCO-AP
    implementation on fixtures with hits, misses, duplicate matches and
    padded slots (the torchmetrics MeanAveragePrecision semantics,
    reference model.py:206-238)."""
    import numpy as np

    from equiadapt_tpu.pipelines.segmentation import mean_average_precision_segm

    rng = np.random.default_rng(0)
    B, N, S = 3, 4, 24
    gt = np.zeros((B, N, S, S), np.float32)
    pred = np.zeros((B, N, S, S), np.float32)
    for b in range(B):
        for j in range(N):
            y, x = rng.integers(2, S - 10, 2)
            h, w = rng.integers(4, 9, 2)
            gt[b, j, y:y + h, x:x + w] = 1.0
            # predictions: some accurate, some shifted (partial IoU), one
            # duplicate of another gt (tests greedy unmatched-gt constraint)
            dy, dx = rng.integers(0, 4, 2)
            src = (b * N + j) % N if (b + j) % 3 == 0 else j
            yy, xx = np.nonzero(gt[b, src])
            pred[b, j][np.clip(yy + dy, 0, S - 1), np.clip(xx + dx, 0, S - 1)] = 1.0
    scores = rng.uniform(0.1, 1.0, (B, N)).astype(np.float32)
    valid = np.ones((B, N), np.float32)
    valid[1, 3] = 0.0  # padded slot
    valid[2, 2] = 0.0
    thresholds = (0.5, 0.75, 0.9)

    ours = float(mean_average_precision_segm(
        jnp.asarray(pred), jnp.asarray(scores), jnp.asarray(gt),
        jnp.asarray(valid), thresholds,
    ))
    ref = _numpy_coco_ap(pred, scores, gt, valid, thresholds)
    assert abs(ours - ref) < 1e-6, (ours, ref)
    assert 0.0 < ours < 1.0, ours


def test_mean_average_precision_perfect_and_empty():
    import numpy as np

    from equiadapt_tpu.pipelines.segmentation import mean_average_precision_segm

    B, N, S = 2, 3, 16
    gt = np.zeros((B, N, S, S), np.float32)
    for b in range(B):
        for j in range(N):
            gt[b, j, 2 + j:6 + j, 3:9] = 1.0
    scores = np.full((B, N), 0.9, np.float32)
    valid = np.ones((B, N), np.float32)
    perfect = float(mean_average_precision_segm(
        jnp.asarray(gt), jnp.asarray(scores), jnp.asarray(gt), jnp.asarray(valid)
    ))
    assert abs(perfect - 1.0) < 1e-6, perfect
    zero = float(mean_average_precision_segm(
        jnp.asarray(np.zeros_like(gt)), jnp.asarray(scores), jnp.asarray(gt),
        jnp.asarray(valid),
    ))
    assert zero == 0.0, zero


def test_mean_average_precision_hand_computed_fixtures():
    """Pin mean_average_precision_segm to HAND-DERIVED COCO AP values
    (torchmetrics MeanAveragePrecision(iou_type='segm') semantics,
    reference examples/images/segmentation/model.py:206-238) on crafted
    cases where the 101-point AP can be computed analytically — the
    round-5 fixture check (torchmetrics/pycocotools are not in this
    image, so the oracle is the arithmetic itself, not a second library).

    Cases: (a) multi-threshold partial IoU, (b) score ties, (c) tied FPs
    ranked above a TP, (d) duplicate match penalty (greedy unmatched-GT
    constraint), (e) empty predictions.
    """
    import numpy as np

    from equiadapt_tpu.pipelines.segmentation import mean_average_precision_segm

    S = 16

    def run(pred, scores, gt, valid, thresholds=None):
        kw = {} if thresholds is None else {"thresholds": thresholds}
        return float(mean_average_precision_segm(
            jnp.asarray(pred), jnp.asarray(scores), jnp.asarray(gt),
            jnp.asarray(valid), **kw,
        ))

    # (a) multi-threshold: 1 pred, 1 gt, IoU exactly 3/4 (pred = 3-px
    # subset of a 4-px gt: inter=3, union=4 — 0.75 is exact in fp32).
    # At t in {.5,.55,.6,.65,.7,.75} the single pred is a TP: precision 1
    # at recall 1 -> 101-pt AP = 1. At t in {.8,.85,.9,.95} it is an FP:
    # AP = 0. mAP = 6/10 = 0.6.
    gt = np.zeros((1, 1, S, S), np.float32)
    gt[0, 0, 4, 2:6] = 1.0
    pred = np.zeros_like(gt)
    pred[0, 0, 4, 2:5] = 1.0
    got = run(pred, np.full((1, 1), 0.9, np.float32), gt,
              np.ones((1, 1), np.float32))
    assert abs(got - 0.6) < 1e-6, got

    # (b) score ties, order-independent: two exact-match preds with EQUAL
    # scores on disjoint gts. Both are TPs whichever tie order the sort
    # picks -> AP = 1 at every threshold.
    gt = np.zeros((1, 2, S, S), np.float32)
    gt[0, 0, 2:5, 2:5] = 1.0
    gt[0, 1, 8:11, 8:11] = 1.0
    got = run(gt, np.full((1, 2), 0.5, np.float32), gt,
              np.ones((1, 2), np.float32))
    assert abs(got - 1.0) < 1e-6, got

    # (c) tied FPs ranked above a TP: preds 0,1 are empty masks (IoU 0,
    # FP at every t) with tied score 0.9; pred 2 matches gt2 exactly at
    # score 0.1. Any tie order gives TP sequence [0, 0, 1]: precision at
    # rank 3 is 1/3, recall 1/3, n_gt = 3. 101-pt AP: recall points
    # r in {0.00..0.33} (34 of 101) take max precision 1/3, the rest 0
    # -> AP = 34/303 at every threshold.
    gt = np.zeros((1, 3, S, S), np.float32)
    gt[0, 0, 1:4, 1:4] = 1.0
    gt[0, 1, 6:9, 6:9] = 1.0
    gt[0, 2, 11:14, 11:14] = 1.0
    pred = np.zeros_like(gt)
    pred[0, 2] = gt[0, 2]
    scores = np.array([[0.9, 0.9, 0.1]], np.float32)
    got = run(pred, scores, gt, np.ones((1, 3), np.float32))
    assert abs(got - 34.0 / 303.0) < 1e-6, (got, 34.0 / 303.0)

    # (d) duplicate match penalty: pred0 = gt0 (score 0.9, TP), pred1 is
    # ALSO gt0 (score 0.5) — gt0 is already matched, gt1 has IoU 0, so
    # pred1 is an FP at every t (greedy unmatched-GT constraint).
    # precision = [1, 1/2], recall = [1/2, 1/2], n_gt = 2. 101-pt AP:
    # r in {0.00..0.50} (51 points) take max precision over positions
    # with recall >= r = max(1, 1/2) = 1; r > 0.5 take 0 -> AP = 51/101.
    gt = np.zeros((1, 2, S, S), np.float32)
    gt[0, 0, 2:6, 2:6] = 1.0
    gt[0, 1, 9:13, 9:13] = 1.0
    pred = np.zeros_like(gt)
    pred[0, 0] = gt[0, 0]
    pred[0, 1] = gt[0, 0]
    scores = np.array([[0.9, 0.5]], np.float32)
    got = run(pred, scores, gt, np.ones((1, 2), np.float32))
    assert abs(got - 51.0 / 101.0) < 1e-6, (got, 51.0 / 101.0)

    # (e) empty predictions against real gts -> mAP exactly 0.
    got = run(np.zeros_like(gt), scores, gt, np.ones((1, 2), np.float32))
    assert got == 0.0, got
