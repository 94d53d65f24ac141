"""Image-classification training pipeline (canonicalize -> predict -> losses).

TPU-native rebuild of reference examples/images/classification/model.py:12-240
and inference_utils.py:8-165. The Lightning module becomes:

* `ImageClassifierPipeline` — a flax module composing canonicalizer +
  prediction network, returning (logits, CanonicalizationInfo);
* pure loss/metric functions combining task CE + prior regularization +
  optimization-specific (group-contrastive) losses with the reference's
  weights (experiment.training.loss, task/prior=100/group_contrast);
* `make_train_step` / `make_eval_step` — single-jit steps with donated
  state, ready to shard over a data-parallel mesh (parallel/mesh.py);
* `vanilla_inference` / `group_inference` — the test-time evaluators;
  group_inference sweeps every group element as one extra batched axis
  (the reference loops Python-side, inference_utils.py:100-122).

Optimizer policy matches the reference (model.py:184-240): SGD+momentum with
milestone decay for resnet50 off-MNIST, AdamW otherwise; separate learning
rates for the prediction vs canonicalization parameter subtrees via
optax.multi_transform; optional frozen prediction network.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from equiadapt_tpu.common.info import (
    IdentityCanonicalizationInfo,
    identity_metric,
    prior_regularization_loss,
)
from equiadapt_tpu.images.canonicalization.continuous_group import (
    steerable_optimization_loss,
)
from equiadapt_tpu.images.canonicalization.discrete_group import (
    optimization_specific_loss,
)

Array = jnp.ndarray


class ImageClassifierPipeline(nn.Module):
    """canonicalize -> predict (reference model.py:59-127 data path)."""

    canonicalizer: nn.Module
    prediction_network: nn.Module
    # rematerialize the prediction network's activations on the backward
    # pass (jax.checkpoint via the flax lifted transform): trades ~1/3 more
    # FLOPs for activation memory, the standard lever for fitting frozen
    # foundation-model backbones (SAM/ViT at large batch) in HBM
    remat: bool = False

    @nn.compact
    def __call__(self, x: Array, training: bool = False):
        out = self.canonicalizer(x, training=training)
        x_canon, info = out
        if self.remat:
            apply = nn.remat(
                lambda mdl, xc, train: mdl(xc, training=train),
                static_argnums=(2,),
            )
            logits = apply(self.prediction_network, x_canon, training)
        else:
            logits = self.prediction_network(x_canon, training=training)
        return logits, info

    def invert(self, info, y, **kw):
        return self.canonicalizer.invert_canonicalization(info, y, **kw)

    def canonicalize(self, x: Array, training: bool = False):
        """(x_canon, info) without the prediction pass — for visualization
        (checkpoint.save_canonized_images) and canonicalizer-only eval."""
        return self.canonicalizer(x, training=training)


class TrainState(struct.PyTreeNode):
    """Minimal train state: params + batch stats + optimizer state."""

    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def classification_loss(
    logits: Array,
    labels: Array,
    info,
    *,
    task_weight: float = 1.0,
    prior_weight: float = 100.0,
    group_contrast_weight: float = 0.0,
    canonicalization_type: str = "group_equivariant",
    out_vector_size: int = 128,
    artifact_err_wt: float = 0.0,
) -> Tuple[Array, Dict[str, Array]]:
    """Weighted sum of task CE + prior + optimization-specific loss
    (reference model.py:74-127)."""
    task = jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    )
    loss = task_weight * task
    metrics = {"loss/task": task}
    if not isinstance(info, IdentityCanonicalizationInfo):
        if prior_weight:
            prior = prior_regularization_loss(info)
            loss = loss + prior_weight * prior
            metrics["loss/prior"] = prior
            metrics["metric/identity"] = identity_metric(info)
        if group_contrast_weight and canonicalization_type == "opt_group_equivariant":
            opt = optimization_specific_loss(
                info, out_vector_size=out_vector_size, artifact_err_wt=artifact_err_wt
            )
            loss = loss + group_contrast_weight * opt
            metrics["loss/group_contrast"] = opt
        if group_contrast_weight and canonicalization_type == "opt_steerable":
            opt = steerable_optimization_loss(info)
            loss = loss + group_contrast_weight * opt
            metrics["loss/group_contrast"] = opt
    acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
    metrics["metric/acc"] = acc
    metrics["loss/total"] = loss
    # NaN guard, the reference's `assert not torch.isnan(loss)` (model.py:125):
    # surfaced as a metric so the (jitted) step stays side-effect free; the
    # train loops assert on it host-side (utils.metrics.assert_finite_loss)
    metrics["loss/finite"] = jnp.isfinite(loss).astype(jnp.float32)
    return loss, metrics


def make_optimizer(
    *,
    architecture: str = "resnet50",
    dataset_name: str = "cifar10",
    learning_rate: float = 1e-3,
    canonicalization_learning_rate: float = 1e-3,
    weight_decay: float = 1e-4,
    freeze_prediction: bool = False,
    milestones: Tuple[int, ...] = (),
    decay_factor: float = 0.1,
) -> optax.GradientTransformation:
    """Per-architecture optimizer policy (reference model.py:184-240).

    Parameter subtrees are labeled by their top-level module name
    ('canonicalizer' vs 'prediction_network') and get independent
    transforms — the analog of torch param groups.
    """
    if architecture == "resnet50" and "mnist" not in dataset_name:
        sched = (
            optax.piecewise_constant_schedule(
                learning_rate, {m: decay_factor for m in milestones}
            )
            if milestones
            else learning_rate
        )
        pred_tx = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(sched, momentum=0.9),
        )
    else:
        pred_tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    if freeze_prediction:
        pred_tx = optax.set_to_zero()
    canon_tx = optax.adamw(canonicalization_learning_rate)

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: (
                "canonicalizer"
                if any(getattr(k, "key", None) == "canonicalizer" for k in path)
                else "prediction"
            ),
            params,
        )

    return optax.multi_transform(
        {"prediction": pred_tx, "canonicalizer": canon_tx}, label_fn
    )


def create_train_state(
    pipeline: nn.Module,
    rng: jax.Array,
    sample_batch: Array,
    tx: optax.GradientTransformation,
    init_rngs: Optional[Dict[str, jax.Array]] = None,
) -> TrainState:
    rngs = {"params": rng}
    if init_rngs:
        rngs.update(init_rngs)
    variables = pipeline.init(rngs, sample_batch, training=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=pipeline.apply,
    )


def make_train_step(
    loss_kwargs: Dict[str, Any],
    rng_names: Tuple[str, ...] = ("dropout",),
    jit: bool = True,
    watch_gradients: bool = False,
):
    """Build the training step (jitted with donated state by default; pass
    jit=False to wrap with parallel.mesh.data_parallel_jit instead).

    watch_gradients=True adds in-jit `grad/<top-level-subtree>/norm` +
    `grad/global_norm` to the step metrics — the device-side half of the
    reference's `wandb.watch(model, log="all")` hook
    (examples/images/classification/train.py:92-97); pair with
    `utils.metrics.gradient_watch` for host-side histograms."""

    def train_step(state: TrainState, batch: Dict[str, Array], rng: jax.Array):
        rngs = dict(zip(rng_names, jax.random.split(jax.random.fold_in(rng, state.step), len(rng_names))))

        def loss_fn(params):
            (logits, info), new_state = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"],
                training=True,
                rngs=rngs,
                mutable=["batch_stats"],
            )
            loss, metrics = classification_loss(
                logits, batch["label"], info, **loss_kwargs
            )
            return loss, (metrics, new_state.get("batch_stats", state.batch_stats))

        (loss, (metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        if watch_gradients:
            sq = jax.tree_util.tree_map(
                lambda g: jnp.sum(jnp.square(g.astype(jnp.float32))), grads
            )
            total = jnp.zeros(())
            for name, sub in sq.items():
                s = sum(jax.tree_util.tree_leaves(sub))
                metrics[f"grad/{name}/norm"] = jnp.sqrt(s)
                total = total + s
            metrics["grad/global_norm"] = jnp.sqrt(total)
        new_state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=0) if jit else train_step


def make_eval_step(loss_kwargs: Dict[str, Any]):
    def eval_step(state: TrainState, batch: Dict[str, Array]):
        logits, info = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"],
            training=False,
        )
        _, metrics = classification_loss(logits, batch["label"], info, **loss_kwargs)
        return metrics

    return jax.jit(eval_step)


# --------------------------------------------------------------------------
# Test-time inference evaluators (reference inference_utils.py:8-165)
# --------------------------------------------------------------------------


def vanilla_inference(state: TrainState, batch: Dict[str, Array], num_classes: int):
    """Accuracy + per-class accuracy (reference VanillaInference :29-76)."""
    logits, _ = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["image"],
        training=False,
    )
    pred = jnp.argmax(logits, -1)
    labels = batch["label"]
    acc = jnp.mean((pred == labels).astype(jnp.float32))
    onehot = jax.nn.one_hot(labels, num_classes)
    correct = onehot * (pred == labels).astype(jnp.float32)[:, None]
    per_class = jnp.sum(correct, 0) / jnp.maximum(jnp.sum(onehot, 0), 1.0)
    return {"test/acc": acc, "test/per_class_acc": per_class}


def group_inference(
    state: TrainState,
    batch: Dict[str, Array],
    *,
    num_rotations: int = 4,
    group_type: str = "rotation",
    grayscale: bool = False,
):
    """Per-group-element robustness sweep (reference GroupInference :79-165).

    Applies every group element to the inputs as one extra batched axis (the
    reference loops per element with pad(0.4W)/rotate/crop; border sampling
    replaces the sandwich) and reports per-element + mean accuracy.
    """
    from equiadapt_tpu.ops.pallas.orbit import materialize_orbit

    x, labels = batch["image"], batch["label"]
    B = x.shape[0]
    mode = "zeros" if grayscale else "border"
    # sign=+1: the reference's GroupInference applies rotate(x, +theta_g)
    # per element (inference_utils.py:100-122), so acc_element_k labels are
    # directly comparable
    orbit = materialize_orbit(
        x, num_rotations, group_type=group_type, padding_mode=mode, sign=1.0
    )
    G = orbit.shape[0] // B
    logits, _ = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        orbit,
        training=False,
    )
    pred = jnp.argmax(logits, -1).reshape(G, B)
    accs = jnp.mean((pred == labels[None]).astype(jnp.float32), axis=1)
    out = {f"test/acc_element_{g}": accs[g] for g in range(G)}
    out["test/group_acc"] = jnp.mean(accs)
    out["test/acc"] = accs[0]
    return out
