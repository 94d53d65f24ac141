"""End-to-end pipeline tests: training reduces the loss; inference
evaluators and the data-parallel mesh path run.

These are the integration anchor the reference lacks (SURVEY.md §4): a full
canonicalize -> predict -> loss -> grad -> update loop under one jit, on
synthetic data, for all three domains.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from equiadapt_tpu.data import (
    generate_nbody_dataset,
    synthetic_image_batch,
    synthetic_pointcloud_batch,
)
import flax.linen as fnn

from equiadapt_tpu.models import GNN, PointNet
from equiadapt_tpu.parallel import data_parallel_jit, make_mesh, replicate, shard_batch
from equiadapt_tpu.pipelines import (
    ImageClassifierPipeline,
    NBodyPipeline,
    PointcloudClassificationPipeline,
    create_nbody_state,
    create_pointcloud_state,
    create_train_state,
    group_inference,
    make_eval_step,
    make_nbody_train_step,
    make_optimizer,
    make_pointcloud_train_step,
    make_train_step,
    vanilla_inference,
)
from equiadapt_tpu.utils import (
    CanonicalizationConfig,
    NetworkHyperparams,
    get_image_canonicalization_network,
    get_image_canonicalizer,
    get_nbody_canonicalizer,
    get_pointcloud_canonicalizer,
)

KEY = jax.random.key(0)


class _SmallCNN(fnn.Module):
    """Tiny conv classifier: the pipeline integration tests exercise the
    canonicalize -> predict -> loss -> grad loop, not the backbone (ResNet
    variants are covered in test_models); a small net keeps the 1-CPU CI
    wall-clock down."""

    num_classes: int = 10

    @fnn.compact
    def __call__(self, x, training=False):
        x = fnn.Conv(16, (3, 3), strides=(2, 2))(x)
        x = fnn.relu(x)
        x = fnn.Conv(32, (3, 3), strides=(2, 2))(x)
        x = fnn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return fnn.Dense(self.num_classes)(x)


def _image_pipeline(canonicalization_type="group_equivariant", network_type="e2cnn"):
    cfg = CanonicalizationConfig(
        canonicalization_type=canonicalization_type,
        network_type=network_type,
        network_hyperparams=NetworkHyperparams(
            kernel_size=3, out_channels=4, num_layers=2, num_rotations=4,
            out_vector_size=32,
        ),
    )
    in_shape = (16, 16, 3)
    net = get_image_canonicalization_network(cfg, in_shape)
    canon = get_image_canonicalizer(cfg, net, in_shape)
    pred = _SmallCNN(num_classes=10)
    return ImageClassifierPipeline(canonicalizer=canon, prediction_network=pred)


@pytest.mark.slow
def test_image_classification_loss_decreases():
    pipe = _image_pipeline()
    batch = synthetic_image_batch(KEY, 16, size=16)
    tx = make_optimizer(architecture="resnet18", learning_rate=1e-2,
                        canonicalization_learning_rate=1e-3)
    state = create_train_state(pipe, jax.random.key(1), batch["image"], tx)
    step = make_train_step({"prior_weight": 1.0})
    first = None
    for i in range(10):
        b = synthetic_image_batch(jax.random.fold_in(KEY, i % 2), 16, size=16)
        state, metrics = step(state, b, jax.random.key(2))
        if first is None:
            first = float(metrics["loss/total"])
    assert float(metrics["loss/total"]) < first

    evalm = make_eval_step({"prior_weight": 1.0})(state, batch)
    assert np.isfinite(float(evalm["loss/total"]))

    vm = vanilla_inference(state, batch, num_classes=10)
    assert 0.0 <= float(vm["test/acc"]) <= 1.0
    gm = group_inference(state, batch, num_rotations=4)
    assert "test/group_acc" in gm
    assert np.isfinite(float(gm["test/group_acc"]))


def test_identity_canonicalizer_pipeline():
    pipe = _image_pipeline(canonicalization_type="identity")
    batch = synthetic_image_batch(KEY, 8, size=16)
    tx = optax.adam(1e-3)
    state = create_train_state(pipe, jax.random.key(1), batch["image"], tx)
    step = make_train_step({"prior_weight": 1.0})
    state, metrics = step(state, batch, jax.random.key(2))
    assert "loss/prior" not in metrics


def test_data_parallel_image_step_on_mesh():
    assert jax.device_count() == 8
    pipe = _image_pipeline()
    mesh = make_mesh(8)
    batch = synthetic_image_batch(KEY, 16, size=16)
    tx = optax.adam(1e-3)
    state = create_train_state(pipe, jax.random.key(1), batch["image"], tx)
    raw_step = make_train_step({"prior_weight": 1.0}, jit=False)
    dp_step = data_parallel_jit(raw_step, mesh, num_extra_args=1)
    state = replicate(state, mesh)
    sharded = shard_batch(batch, mesh)
    state, metrics = dp_step(state, sharded, jax.random.key(3))
    assert np.isfinite(float(metrics["loss/total"]))
    # one more step to confirm donated-state stability
    state, metrics2 = dp_step(state, shard_batch(batch, mesh), jax.random.key(4))
    assert np.isfinite(float(metrics2["loss/total"]))


@pytest.mark.slow
def test_pointcloud_classification_loss_decreases():
    cfg = CanonicalizationConfig(
        canonicalization_type="continuous_group",
        network_hyperparams=NetworkHyperparams(n_knn=8, pooling="mean"),
    )
    canon = get_pointcloud_canonicalizer(cfg)
    pipe = PointcloudClassificationPipeline(
        canonicalizer=canon,
        prediction_network=PointNet(num_classes=8, emb_dims=32),
    )
    batch = synthetic_pointcloud_batch(KEY, 8, num_points=32)
    tx = optax.adam(1e-3)
    state = create_pointcloud_state(pipe, jax.random.key(1), (batch["points"],), tx)
    step = make_pointcloud_train_step(num_classes=8, train_rotation="so3")
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.key(2))
        losses.append(float(metrics["loss/total"]))
    # so3 augmentation makes per-step loss noisy: compare the trend
    assert min(losses[-3:]) < losses[0], losses
    assert 0.0 <= float(metrics["metric/balanced_acc"]) <= 1.0


@pytest.mark.slow
def test_nbody_pipeline_loss_decreases():
    data = generate_nbody_dataset(jax.random.key(5), 16, steps=1000, sample_freq=50)
    cfg = CanonicalizationConfig(
        canonicalization_type="continuous_group",
        network_hyperparams=NetworkHyperparams(
            hidden_dim=8, num_layers=2, canon_feature="pv"
        ),
    )
    canon = get_nbody_canonicalizer(cfg)
    pipe = NBodyPipeline(
        canonicalizer=canon, prediction_network=GNN(hidden_dim=16, num_layers=2)
    )
    tx = optax.adam(1e-3)
    state = create_nbody_state(pipe, jax.random.key(6), data, tx)
    step = make_nbody_train_step()
    first = None
    for i in range(10):
        state, metrics = step(state, data, jax.random.key(7))
        if first is None:
            first = float(metrics["loss/task"])
    assert float(metrics["loss/task"]) < first


def test_fsdp_sharded_train_step_on_mesh():
    """FSDP parameter sharding over the 8-device mesh: large leaves are
    actually sharded (addressable shard < full leaf), optimizer moments
    land on matching shards, and a train step runs with XLA-inserted
    collectives (inputs carry shardings; jit infers the rest)."""
    from equiadapt_tpu.parallel import make_mesh, shard_batch, shard_state_fsdp

    assert jax.device_count() == 8
    pipe = _image_pipeline()
    mesh = make_mesh(8)
    batch = synthetic_image_batch(KEY, 16, size=16)
    tx = optax.adamw(1e-3)
    state = create_train_state(pipe, jax.random.key(1), batch["image"], tx)
    state = shard_state_fsdp(state, mesh, min_shard_bytes=1 << 10)

    # at least one parameter leaf must be genuinely sharded
    def shard_frac(x):
        try:
            shard = x.addressable_shards[0].data
            return shard.size / x.size
        except Exception:
            return 1.0

    fracs = [shard_frac(x) for x in jax.tree_util.tree_leaves(state.params)]
    assert min(fracs) <= 0.125 + 1e-6, fracs
    # adam moments follow the same sharding as their parameters
    m_fracs = [shard_frac(x) for x in jax.tree_util.tree_leaves(state.opt_state)]
    assert min(m_fracs) <= 0.125 + 1e-6, m_fracs

    step = jax.jit(make_train_step({"prior_weight": 1.0}, jit=False),
                   donate_argnums=0)
    state, metrics = step(state, shard_batch(batch, mesh), jax.random.key(2))
    assert np.isfinite(float(metrics["loss/total"]))
    state, metrics2 = step(state, shard_batch(batch, mesh), jax.random.key(3))
    assert np.isfinite(float(metrics2["loss/total"]))


def test_remat_pipeline_matches_plain_gradients():
    """remat=True must not change logits or gradients (it only changes
    what is stored vs recomputed on the backward pass)."""
    import optax

    from equiadapt_tpu.models import ResNet18
    from equiadapt_tpu.images import (
        EquivariantNetwork, GroupEquivariantImageCanonicalization,
    )
    from equiadapt_tpu.pipelines import (
        ImageClassifierPipeline, create_train_state, make_train_step,
    )

    net = EquivariantNetwork(in_channels=3, out_channels=4, kernel_size=3,
                             group_type="rotation", num_rotations=4,
                             num_layers=2)
    canon = GroupEquivariantImageCanonicalization(
        canonicalization_network=net, in_shape=(16, 16, 3),
        num_rotations=4, group_type="rotation",
    )
    pred = ResNet18(num_classes=4, small_images=True)
    rng = np.random.default_rng(3)
    batch = {
        "image": rng.normal(size=(4, 16, 16, 3)).astype(np.float32),
        "label": rng.integers(0, 4, size=(4,)).astype(np.int32),
    }
    tx = optax.sgd(1e-2)
    step = make_train_step({"prior_weight": 1.0}, jit=True)
    outs = []
    for use_remat in (False, True):
        pipe = ImageClassifierPipeline(
            canonicalizer=canon, prediction_network=pred, remat=use_remat
        )
        state = create_train_state(pipe, jax.random.key(0), batch["image"], tx)
        state, metrics = step(state, batch, jax.random.key(1))
        outs.append((float(metrics["loss/total"]), state.params))
    assert np.allclose(outs[0][0], outs[1][0], rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(outs[0][1]), jax.tree_util.tree_leaves(outs[1][1])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_watch_gradients_metrics_and_host_histograms():
    """watch_gradients=True adds in-jit grad norms to step metrics (the
    reference's wandb.watch analog, train.py:92-97); gradient_watch builds
    host-side histograms from a grad pytree."""
    from equiadapt_tpu.utils.metrics import gradient_watch

    pipe = _image_pipeline()
    batch = synthetic_image_batch(KEY, 8, size=16)
    tx = make_optimizer(architecture="resnet18", learning_rate=1e-2,
                        canonicalization_learning_rate=1e-3)
    state = create_train_state(pipe, jax.random.key(1), batch["image"], tx)
    step = make_train_step({"prior_weight": 1.0}, watch_gradients=True)
    state, metrics = step(state, batch, jax.random.key(2))
    gkeys = [k for k in metrics if k.startswith("grad/")]
    assert "grad/global_norm" in metrics
    assert len(gkeys) >= 2  # at least one subtree + the global norm
    gn = float(metrics["grad/global_norm"])
    assert np.isfinite(gn) and gn > 0.0
    # subtree norms compose to the global norm
    sub = [float(metrics[k]) ** 2 for k in gkeys if k != "grad/global_norm"]
    np.testing.assert_allclose(np.sqrt(sum(sub)), gn, rtol=1e-5)

    hw = gradient_watch({"a": jnp.asarray([3.0, 4.0]), "b": jnp.zeros((2, 2))})
    np.testing.assert_allclose(hw["grad/a/norm"], 5.0)
    np.testing.assert_allclose(hw["grad/global_norm"], 5.0)
    assert sum(hw["grad/a/log10_hist"]) == 2
