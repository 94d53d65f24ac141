"""Config taxonomy, checkpointing, and metric-logger tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from equiadapt_tpu.data import synthetic_image_batch
from equiadapt_tpu.models import ResNet18
from equiadapt_tpu.pipelines import (
    ImageClassifierPipeline,
    create_train_state,
    make_train_step,
)
from equiadapt_tpu.utils import (
    CanonicalizationConfig,
    Config,
    NetworkHyperparams,
    get_image_canonicalization_network,
    get_image_canonicalizer,
)
from equiadapt_tpu.utils.checkpoint import (
    best_metric_saver,
    restore_checkpoint,
    restore_config,
    save_checkpoint,
)
from equiadapt_tpu.utils.metrics import EarlyStopping, MetricLogger

KEY = jax.random.key(0)


def test_config_roundtrip_and_overrides():
    cfg = Config()
    d = cfg.to_dict()
    cfg2 = Config.from_dict(d)
    assert cfg2 == cfg

    cfg3 = cfg.override(
        "experiment.seed=7",
        "canonicalization.network_hyperparams.num_rotations=8",
        "canonicalization.resize_shape=64",
        "prediction.freeze_encoder=true",
        "dataset.dataset_name=cifar10",
    )
    assert cfg3.experiment.seed == 7
    assert cfg3.canonicalization.network_hyperparams.num_rotations == 8
    assert cfg3.canonicalization.resize_shape == 64
    assert cfg3.prediction.freeze_encoder is True
    assert cfg3.dataset.dataset_name == "cifar10"


def test_config_yaml(tmp_path):
    import yaml

    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump({"experiment": {"seed": 3}, "dataset": {"num_classes": 7}}))
    from equiadapt_tpu.utils import load_yaml

    cfg = load_yaml(str(p))
    assert cfg.experiment.seed == 3
    assert cfg.dataset.num_classes == 7


class _TinyPredNet(__import__("flax").linen.Module):
    """Small conv head: checkpoint/restore logic doesn't need ResNet18."""

    num_classes: int = 4

    @__import__("flax").linen.compact
    def __call__(self, x, training=False):
        import flax.linen as fnn

        x = fnn.Conv(8, (3, 3), strides=(2, 2))(x)
        x = fnn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return fnn.Dense(self.num_classes)(x)


def _tiny_state():
    cfg = CanonicalizationConfig(
        network_hyperparams=NetworkHyperparams(out_channels=4, num_layers=2)
    )
    in_shape = (16, 16, 3)
    net = get_image_canonicalization_network(cfg, in_shape)
    canon = get_image_canonicalizer(cfg, net, in_shape)
    pipe = ImageClassifierPipeline(
        canonicalizer=canon, prediction_network=_TinyPredNet(num_classes=4)
    )
    batch = synthetic_image_batch(KEY, 4, size=16, num_classes=4)
    state = create_train_state(pipe, KEY, batch["image"], optax.adam(1e-3))
    return pipe, state, batch


def test_checkpoint_save_restore_and_config(tmp_path):
    pipe, state, batch = _tiny_state()
    cfg = Config().override("experiment.seed=42")
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, cfg)

    # config snapshot restores (the reference's test-mode flow)
    cfg2 = restore_config(path)
    assert cfg2.experiment.seed == 42

    # params restore bit-exact into a fresh state
    _, fresh, _ = _tiny_state()
    step = make_train_step({"prior_weight": 1.0})
    fresh, _ = step(fresh, batch, jax.random.key(1))  # diverge first
    restored = restore_checkpoint(path, fresh)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_async_checkpointer_restart_from_latest(tmp_path):
    from equiadapt_tpu.utils.checkpoint import AsyncTrainCheckpointer

    pipe, state, batch = _tiny_state()
    cfg = Config().override("experiment.seed=7")
    mgr = AsyncTrainCheckpointer(str(tmp_path / "run"), max_to_keep=2, config=cfg)

    # fresh dir -> no checkpoint yet
    _, none_step = mgr.restore_latest(state)
    assert none_step is None

    step = make_train_step({"prior_weight": 1.0})
    mgr.save(0, state)
    state1, _ = step(state, batch, jax.random.key(1))
    state1 = state1.replace(step=state1.step)  # keep treedef
    mgr.save(1, state1)
    mgr.wait()

    _, fresh, _ = _tiny_state()
    restored, latest = mgr.restore_latest(fresh)
    assert latest == 1
    a = jax.tree_util.tree_leaves(state1.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # config snapshot travels with the run dir
    assert restore_config(str(tmp_path / "run")).experiment.seed == 7
    mgr.close()


def test_best_metric_saver(tmp_path):
    _, state, _ = _tiny_state()
    saver = best_metric_saver(str(tmp_path / "best"), mode="max")
    assert saver.maybe_save(0.5, state)
    assert not saver.maybe_save(0.4, state)
    assert saver.maybe_save(0.9, state)
    assert saver.best == 0.9


def test_metric_logger_and_early_stopping(tmp_path):
    log = tmp_path / "log.jsonl"
    m = MetricLogger(str(log))
    m.update({"a": jnp.asarray(1.0), "b": jnp.asarray(2.0)})
    m.update({"a": jnp.asarray(3.0)})
    means = m.flush(step=0)
    assert means["a"] == 2.0 and means["b"] == 2.0
    row = json.loads(log.read_text().strip())
    assert row["step"] == 0 and row["a"] == 2.0

    es = EarlyStopping(patience=2, mode="max")
    assert not es.update(0.5)
    assert not es.update(0.4)
    assert es.update(0.3)  # second bad check -> stop


def test_load_prediction_params_from_mismatched_canonicalizer(tmp_path):
    """Prediction-subtree transfer must work when the donor checkpoint's
    canonicalizer differs from the current state's (the exact scenario the
    reference's independent prediction-net loading covers,
    train_utils.py:46-58)."""
    from equiadapt_tpu.utils.checkpoint import load_prediction_params_from

    # donor: num_rotations=4 canonicalizer
    _, donor_state, _ = _tiny_state()
    path = str(tmp_path / "donor")
    save_checkpoint(path, donor_state, Config())

    # current: a DIFFERENT canonicalizer (8 rotations -> different shapes)
    cfg = CanonicalizationConfig(
        network_hyperparams=NetworkHyperparams(
            out_channels=4, num_layers=2, num_rotations=8
        )
    )
    in_shape = (16, 16, 3)
    net = get_image_canonicalization_network(cfg, in_shape)
    canon = get_image_canonicalizer(cfg, net, in_shape)
    pipe = ImageClassifierPipeline(
        canonicalizer=canon, prediction_network=_TinyPredNet(num_classes=4)
    )
    batch = synthetic_image_batch(KEY, 4, size=16, num_classes=4)
    state = create_train_state(pipe, jax.random.key(7), batch["image"], optax.adam(1e-3))

    new_state = load_prediction_params_from(path, state)
    a = jax.tree_util.tree_leaves(new_state.params["prediction_network"])
    b = jax.tree_util.tree_leaves(donor_state.params["prediction_network"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # canonicalizer params untouched
    c = jax.tree_util.tree_leaves(new_state.params["canonicalizer"])
    d = jax.tree_util.tree_leaves(state.params["canonicalizer"])
    for x, y in zip(c, d):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_assert_finite_loss_guard():
    from equiadapt_tpu.utils.metrics import assert_finite_loss

    assert_finite_loss({"loss/finite": np.float32(1.0)})  # passes
    assert_finite_loss({})  # missing key: no-op
    with pytest.raises(FloatingPointError):
        assert_finite_loss({"loss/finite": np.float32(0.0)})


def test_profile_trace_smoke(tmp_path):
    from equiadapt_tpu.utils.profiling import annotate, device_memory_stats, profile_trace

    with profile_trace(str(tmp_path / "trace"), enabled=True):
        with annotate("canon/test"):
            jnp.sum(jnp.ones((8, 8))).block_until_ready()
    assert any(tmp_path.glob("trace/**/*")), "no trace artifacts written"
    with profile_trace(str(tmp_path / "off"), enabled=False):
        pass
    device_memory_stats()  # must not raise


def test_lr_find_suggests_descending_region():
    """The LR-finder heuristic picks the steepest-descent LR on a canonical
    curve (flat -> steep drop -> divergence), like Lightning's LRFinder."""
    from equiadapt_tpu.utils.tuner import _suggest

    lrs = np.logspace(-6, 0, 60)
    # flat until 1e-4, steep drop around 1e-3..1e-2, divergence after 1e-1
    losses = np.where(lrs < 1e-4, 2.0, np.where(lrs < 3e-2, 2.0 - 1.5 *
                      (np.log10(lrs / 1e-4) / np.log10(3e-2 / 1e-4)),
                      0.5 + 50 * (lrs - 3e-2)))
    s = _suggest(lrs, losses.astype(np.float64))
    assert 1e-4 < s < 5e-2, s


def test_restore_checkpoint_nonstrict_tolerates_mismatch(tmp_path):
    """strict=False keeps template leaves where the donor is missing or
    shape-mismatched (the reference's strict_loading knob)."""
    pipe, state, batch = _tiny_state()
    path = str(tmp_path / "ck")
    save_checkpoint(path, state)

    # a state with a different prediction head shape (7 classes vs 4)
    cfg = CanonicalizationConfig(
        network_hyperparams=NetworkHyperparams(out_channels=4, num_layers=2)
    )
    in_shape = (16, 16, 3)
    net = get_image_canonicalization_network(cfg, in_shape)
    canon = get_image_canonicalizer(cfg, net, in_shape)
    pipe2 = ImageClassifierPipeline(
        canonicalizer=canon, prediction_network=_TinyPredNet(num_classes=7)
    )
    batch2 = synthetic_image_batch(KEY, 4, size=16, num_classes=7)
    state2 = create_train_state(
        pipe2, jax.random.key(9), batch2["image"], optax.adam(1e-3)
    )
    with pytest.raises(Exception):
        restore_checkpoint(path, state2, strict=True)
    restored = restore_checkpoint(path, state2, strict=False)
    # a matching leaf came from the checkpoint...
    don = state.params["canonicalizer"]
    got = restored.params["canonicalizer"]
    for x, y in zip(
        jax.tree_util.tree_leaves(don), jax.tree_util.tree_leaves(got)
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # ...and the mismatched head kept the template values
    head_t = jax.tree_util.tree_leaves(state2.params["prediction_network"])
    head_r = jax.tree_util.tree_leaves(restored.params["prediction_network"])
    kept_any = any(
        np.shape(a) != np.shape(b)
        or np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(head_t, head_r)
    )
    assert kept_any


def test_device_op_attribution_from_trace(tmp_path):
    """profile_trace + device_op_attribution roundtrip on the CPU backend."""
    import jax
    import jax.numpy as jnp

    from equiadapt_tpu.utils.profiling import (
        device_op_attribution,
        profile_trace,
    )

    x = jnp.ones((128, 128))
    f = jax.jit(lambda a: (a @ a).sum())
    float(f(x))  # compile outside the trace
    with profile_trace(str(tmp_path)):
        float(f(x))
    rows = device_op_attribution(str(tmp_path))
    assert rows and all(ms >= 0 for _, ms in rows)
