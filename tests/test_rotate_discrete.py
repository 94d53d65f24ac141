"""rotate_discrete == dynamic rotate at group angles (exact numerics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equiadapt_tpu.ops.warp import group_angles, rotate, rotate_discrete


@pytest.mark.parametrize("n,mode", [(4, "border"), (8, "border"), (8, "zeros"), (6, "zeros")])
def test_rotate_discrete_matches_dynamic(n, mode):
    rng = np.random.default_rng(0)
    B = n
    x = jnp.asarray(rng.normal(size=(B, 16, 16, 3)).astype(np.float32))
    idx = jnp.arange(B) % n
    onehot = jax.nn.one_hot(idx, n)
    angles = group_angles(n)
    for sign in (-1.0, 1.0):
        ours = rotate_discrete(x, onehot, n, sign=sign, padding_mode=mode)
        ref = rotate(x, sign * angles[idx], padding_mode=mode)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_rotate_discrete_nonsquare_fallback():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 12, 20, 3)).astype(np.float32))
    onehot = jax.nn.one_hot(jnp.arange(4), 4)
    ours = rotate_discrete(x, onehot, 4, sign=-1.0, padding_mode="zeros")
    ref = rotate(x, -group_angles(4)[jnp.arange(4)], padding_mode="zeros")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_rotate_discrete_gradient_flows_through_onehot():
    x = jnp.ones((2, 8, 8, 1))
    def loss(logits):
        oh = jax.nn.softmax(logits, -1)
        return jnp.sum(rotate_discrete(x, oh, 4, sign=-1.0, padding_mode="zeros"))
    g = jax.grad(loss)(jnp.zeros((2, 4)))
    assert np.isfinite(np.asarray(g)).all()
