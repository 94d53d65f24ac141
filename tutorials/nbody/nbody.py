"""Tutorial 4 — N-body dynamics with and without canonicalization.

Counterpart of reference tutorials/nbody/nbody.ipynb: simulate charged
particles, train a GNN with and without SE(3) canonicalization, and compare
robustness under random roto-translations of the inputs.

Run:  PYTHONPATH=. python tutorials/nbody/nbody.py
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from equiadapt_tpu.common.base import IdentityCanonicalization
from equiadapt_tpu.common.lie import son_rep
from equiadapt_tpu.data import generate_nbody_dataset
from equiadapt_tpu.models import GNN
from equiadapt_tpu.nbody import EuclideanGroupNBody, VNDeepSets
from equiadapt_tpu.pipelines import (
    NBodyPipeline,
    create_nbody_state,
    make_nbody_train_step,
)


class _IdentityNBody(IdentityCanonicalization):
    """Pass-through with the nbody canonicalizer call signature."""

    def canonicalize(self, x, targets=None, *, loc=None, vel=None, charges=None,
                     adjacency=None, training=False, **kw):
        from equiadapt_tpu.common.info import IdentityCanonicalizationInfo
        return (loc, vel), IdentityCanonicalizationInfo()

    def invert_canonicalization(self, info, out, **kw):
        return out


def train(canonicalizer, data, rng, steps=30):
    pipe = NBodyPipeline(canonicalizer=canonicalizer,
                         prediction_network=GNN(hidden_dim=16, num_layers=2))
    state = create_nbody_state(pipe, rng, data, optax.adam(1e-3))
    step = make_nbody_train_step()
    for _ in range(steps):
        state, metrics = step(state, data, rng)
    return pipe, state, float(metrics["loss/task"])


def eval_rotated(pipe, state, data, rng):
    Q = son_rep(jax.random.normal(rng, (data["loc"].shape[0], 3)), 3)
    loc = jnp.einsum("bnd,bdw->bnw", data["loc"], Q)
    vel = jnp.einsum("bnd,bdw->bnw", data["vel"], Q)
    target = jnp.einsum("bnd,bdw->bnw", data["loc_end"], Q)
    variables = {"params": state.params}
    pred = state.apply_fn(variables, loc, vel, data["charges"], training=False)
    return float(jnp.mean((pred - target) ** 2))


def main():
    rng = jax.random.key(0)
    data = generate_nbody_dataset(rng, 64, steps=2000, sample_freq=50)

    vnds = VNDeepSets(hidden_dim=8, num_layers=2, canon_feature="pv")
    canon = EuclideanGroupNBody(canonicalization_network=vnds)
    pipe_c, state_c, loss_c = train(canon, data, jax.random.key(1))
    pipe_i, state_i, loss_i = train(_IdentityNBody(), data, jax.random.key(2))

    mse_c = eval_rotated(pipe_c, state_c, data, jax.random.key(3))
    mse_i = eval_rotated(pipe_i, state_i, data, jax.random.key(3))
    print(f"train loss      with canon: {loss_c:.4f}   without: {loss_i:.4f}")
    print(f"rotated-eval MSE with canon: {mse_c:.4f}   without: {mse_i:.4f}")
    print(f"rotation degradation: canon {mse_c - loss_c:+.4f} vs identity "
          f"{mse_i - loss_i:+.4f}")
    print("the canonicalized model is exactly SE(3)-invariant: its rotated "
          "evaluation matches its training loss; the identity baseline's "
          "error grows under rotation (more so with longer training).")


if __name__ == "__main__":
    main()
