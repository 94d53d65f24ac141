"""N-body training pipeline: canonicalize -> GNN -> invert -> MSE.

TPU-native rebuild of reference examples/nbody/model.py:15-164. The
Lightning step becomes one pure jitted function over dense (B, n, 3)
tensors; node/edge feature construction (||vel||, [q_i q_j, d^2]) lives in
models/egnn.py.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from equiadapt_tpu.pipelines.classification import TrainState

Array = jnp.ndarray

__all__ = ["NBodyPipeline", "make_nbody_train_step", "create_nbody_state"]


class NBodyPipeline(nn.Module):
    """Canonicalize (loc, vel) -> predict future loc -> invert
    (reference model.py:48-100)."""

    canonicalizer: nn.Module
    prediction_network: nn.Module

    @nn.compact
    def __call__(
        self,
        loc: Array,
        vel: Array,
        charges: Array,
        training: bool = False,
    ) -> Array:
        nodes = jnp.linalg.norm(vel, axis=-1, keepdims=True)
        (c_loc, c_vel), info = self.canonicalizer(
            nodes, loc=loc, vel=vel, charges=charges, training=training
        )
        pred = self.prediction_network(c_loc, c_vel, charges, training=training)
        # the GNN predicts canonical-frame positions; map back (model.py:95)
        return self.canonicalizer.invert_canonicalization(info, pred)


def create_nbody_state(
    pipeline: NBodyPipeline,
    rng: jax.Array,
    sample: Dict[str, Array],
    tx: optax.GradientTransformation,
) -> TrainState:
    variables = pipeline.init(
        {"params": rng}, sample["loc"], sample["vel"], sample["charges"], training=True
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=tx.init(variables["params"]),
        tx=tx,
        apply_fn=pipeline.apply,
    )


def make_nbody_train_step(jit: bool = True):
    def train_step(state: TrainState, batch: Dict[str, Array], rng: jax.Array):
        rngs = {"dropout": jax.random.fold_in(rng, state.step)}

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            pred = state.apply_fn(
                variables, batch["loc"], batch["vel"], batch["charges"],
                training=True, rngs=rngs,
            )
            loss = jnp.mean((pred - batch["loc_end"]) ** 2)
            return loss, {
                "loss/task": loss,
                "loss/finite": jnp.isfinite(loss).astype(jnp.float32),
            }

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=0) if jit else train_step
