"""End-to-end learning validation: prior-regularized training actually
teaches canonical alignment.

The product claim (reference basecanonicalization.py:1-19): training with
the prior CE loss drives the canonicalizer toward the identity element on
the training distribution; the energy network's equivariance then maps any
group-transformed input to the SAME canonical pose. The reference never
tests this end-to-end; here we train the C4 canonicalizer (prior loss only,
no classifier in the loop) on structured images and assert:

* identity metric on the training distribution approaches 1;
* canonical images of all four rotated copies agree (pose invariance);
* selected elements shift exactly with the applied rotation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from equiadapt_tpu.common.info import identity_metric, prior_regularization_loss
from equiadapt_tpu.images import (
    EquivariantNetwork,
    GroupEquivariantImageCanonicalization,
)


def _oriented_images(key, b, size=16):
    """Images with a strong orientation cue: a vertical gradient ramp plus
    low-frequency noise (so the task is learnable but not degenerate)."""
    ramp = jnp.linspace(0.0, 1.0, size)[None, :, None, None]
    ramp = jnp.broadcast_to(ramp, (b, size, size, 3))
    coarse = jax.random.uniform(key, (b, size // 4, size // 4, 3))
    noise = jax.image.resize(coarse, (b, size, size, 3), method="linear")
    return 0.7 * ramp + 0.3 * noise


def test_prior_training_learns_canonical_alignment():
    net = EquivariantNetwork(
        in_channels=3, out_channels=8, kernel_size=3, group_type="rotation",
        num_rotations=4, num_layers=2, dropout_rate=0.0,
    )
    canon = GroupEquivariantImageCanonicalization(
        canonicalization_network=net, in_shape=(16, 16, 3),
        num_rotations=4, group_type="rotation", beta=2.0,
    )
    key = jax.random.key(0)
    x0 = _oriented_images(key, 32)
    variables = canon.init(jax.random.key(1), x0, training=False)
    params, bs = variables["params"], variables["batch_stats"]
    tx = optax.adam(2e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, bs, opt, x):
        def loss_fn(p):
            (xc, info), new = canon.apply(
                {"params": p, "batch_stats": bs}, x, training=True,
                rngs={"dropout": jax.random.key(2)},
                mutable=["batch_stats"],
            )
            return prior_regularization_loss(info), (info, new["batch_stats"])

        (loss, (info, new_bs)), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(g, opt, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss, info

    first = None
    for i in range(150):
        x = _oriented_images(jax.random.fold_in(key, i), 32)
        params, bs, opt, loss, info = step(params, bs, opt, x)
        if first is None:
            first = float(loss)
    assert float(loss) < first, (first, float(loss))

    # identity metric on the training distribution approaches 1
    xe = _oriented_images(jax.random.fold_in(key, 999), 64)
    _, info_e = canon.apply(
        {"params": params, "batch_stats": bs}, xe, training=False
    )
    idm = float(identity_metric(info_e))
    assert idm > 0.9, idm

    # pose invariance: canonical images of all rotated copies agree, and
    # the selected element shifts exactly with the applied rotation
    base_sel = info_e.onehot.argmax(-1)
    xc0, _ = canon.apply({"params": params, "batch_stats": bs}, xe, training=False)
    for k in (1, 2, 3):
        xr = jnp.rot90(xe, k=k, axes=(1, 2))
        xck, info_k = canon.apply(
            {"params": params, "batch_stats": bs}, xr, training=False
        )
        shift = (info_k.onehot.argmax(-1) - base_sel) % 4
        frac_correct = float(jnp.mean((shift == k).astype(jnp.float32)))
        assert frac_correct > 0.9, (k, frac_correct)
        agree = (jnp.abs(xck - xc0).max(axis=(1, 2, 3)) < 1e-4)
        assert float(jnp.mean(agree.astype(jnp.float32))) > 0.9, k
