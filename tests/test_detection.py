"""MaskRCNNLite: shapes, losses, training step, detection fallback."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from equiadapt_tpu.models.detection import MaskRCNNLite, decode_boxes, maskrcnn_lite_loss

KEY = jax.random.key(0)


def _batch(b=2, size=64, n=4, seed=0):
    rng = np.random.default_rng(seed)
    images = jnp.asarray(rng.normal(size=(b, size, size, 3)).astype(np.float32))
    x1 = rng.uniform(4, size // 2, size=(b, n))
    y1 = rng.uniform(4, size // 2, size=(b, n))
    boxes = np.stack([x1, y1, x1 + size // 4, y1 + size // 4], -1).astype(np.float32)
    masks = np.zeros((b, n, size, size), np.float32)
    for i in range(b):
        for j in range(n):
            xa, ya, xb, yb = boxes[i, j].astype(int)
            masks[i, j, ya:yb, xa:xb] = 1.0
    return {
        "image": images,
        "targets": {
            "boxes": jnp.asarray(boxes),
            "masks": jnp.asarray(masks),
            "labels": jnp.asarray(rng.integers(0, 5, size=(b, n))),
            "valid": jnp.ones((b, n)),
        },
    }


def test_decode_boxes():
    centers = jnp.array([[10.0, 20.0]])
    ltrb = jnp.array([[2.0, 3.0, 4.0, 5.0]])
    np.testing.assert_allclose(
        np.asarray(decode_boxes(centers, ltrb)), [[8.0, 17.0, 14.0, 25.0]]
    )


@pytest.mark.slow
def test_forward_and_loss():
    m = MaskRCNNLite(num_classes=5, max_instances=4, channels=32)
    b = _batch()
    variables = m.init(KEY, b["image"], b["targets"]["boxes"], training=False)
    out = m.apply(variables, b["image"], b["targets"]["boxes"])
    assert out["pred_masks"].shape == (2, 4, 64, 64)
    assert out["det_boxes"].shape == (2, 4, 4)
    assert out["det_scores"].shape == (2, 4)
    loss, metrics = maskrcnn_lite_loss(out, b["targets"])
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


@pytest.mark.slow
def test_inference_mode_uses_predicted_boxes():
    m = MaskRCNNLite(num_classes=5, max_instances=3, channels=32)
    b = _batch(n=3)
    variables = m.init(KEY, b["image"], b["targets"]["boxes"])
    out = m.apply(variables, b["image"])  # no GT boxes
    assert out["pred_masks"].shape == (2, 3, 64, 64)
    s = np.asarray(out["det_scores"])
    assert np.all(np.diff(s, axis=-1) <= 1e-6)  # top-k ordering


@pytest.mark.slow
def test_train_step_reduces_loss():
    m = MaskRCNNLite(num_classes=5, max_instances=4, channels=32)
    b = _batch()
    variables = m.init(KEY, b["image"], b["targets"]["boxes"], training=True)
    params, bs = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, bs, opt):
        def loss_fn(p):
            out, new = m.apply(
                {"params": p, "batch_stats": bs}, b["image"], b["targets"]["boxes"],
                training=True, mutable=["batch_stats"],
            )
            loss, _ = maskrcnn_lite_loss(out, b["targets"])
            return loss, new["batch_stats"]

        (loss, nbs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, nopt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), nbs, nopt, loss

    first = None
    for _ in range(6):
        params, bs, opt, loss = step(params, bs, opt)
        if first is None:
            first = float(loss)
    assert float(loss) < first


@pytest.mark.slow
def test_torchvision_behavioral_semantics():
    """Score-ranked detections + empty-prediction fallback (the reference
    MaskRCNNModel wrapper's eval semantics, model_utils.py:37-97):
    det_scores are descending per image, and slots below score_threshold
    come back zeroed (boxes, labels, scores) with suppressed masks."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from equiadapt_tpu.models.detection import MaskRCNNLite

    m = MaskRCNNLite(num_classes=5, max_instances=4, channels=32,
                     score_threshold=0.6)
    x = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3))
    variables = m.init(jax.random.key(1), x, training=False)
    out = m.apply(variables, x, training=False)
    scores = np.asarray(out["det_scores"])
    # score-ranked: descending within each image
    assert (np.diff(scores, axis=1) <= 1e-6).all(), scores
    valid = np.asarray(out["det_valid"])
    # a fresh random model scores ~sigmoid(0)=0.5 < 0.6: everything below
    # threshold must be fully zeroed (the empty-prediction fallback)
    below = valid < 0.5
    assert below.any(), "pick a higher threshold for this fixture"
    assert (np.asarray(out["det_boxes"])[below] == 0).all()
    assert (scores[below] == 0).all()
    assert (np.asarray(out["det_labels"])[below] == 0).all()
    # suppressed masks: sigmoid(logit) ~ 0 everywhere for invalid slots
    masks = np.asarray(out["pred_masks"])
    probs = 1.0 / (1.0 + np.exp(-masks[below]))
    assert (probs < 1e-3).all()
