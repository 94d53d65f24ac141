"""Core group-math, selector and Lie-parameterization tests.

Includes a port of the reference's golden-value gram_schmidt test
(reference tests/common/test_utils.py:6-12): with torch.manual_seed(0) the
reference asserts sum(result) == 0.5740. We regenerate the same input via
torch (CPU) and check our JAX gram_schmidt matches the same golden value.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equiadapt_tpu.common import (
    LieParameterization,
    gram_schmidt,
    modified_gram_schmidt,
)
from equiadapt_tpu.common.math import gram_schmidt_2d, rotmat_2d_from_vector, det_2x2
from equiadapt_tpu.common.selector import (
    gumbel_softmax_onehot,
    select_onehot,
    straight_through_onehot,
)


def test_gram_schmidt_golden_value_torch_parity():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    vectors = torch.randn(1, 3, 3)
    ours = gram_schmidt(jnp.asarray(vectors.numpy()))
    # reference asserts output[0][0][0] == 0.5740 (tests/common/test_utils.py:12)
    assert np.isclose(float(ours[0, 0, 0]), 0.5740, atol=1e-4)


def test_gram_schmidt_orthonormal():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(8, 3, 3)).astype(np.float32))
    for fn in (gram_schmidt, modified_gram_schmidt):
        frames = fn(v)
        gram = jnp.einsum("bij,bkj->bik", frames, frames)
        np.testing.assert_allclose(
            np.asarray(gram), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5
        )


def test_gram_schmidt_2d_and_rotmat():
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.normal(size=(16, 2, 2)).astype(np.float32))
    frames = gram_schmidt_2d(v)
    gram = jnp.einsum("bij,bkj->bik", frames, frames)
    np.testing.assert_allclose(
        np.asarray(gram), np.broadcast_to(np.eye(2), (16, 2, 2)), atol=1e-5
    )
    rot = rotmat_2d_from_vector(v[:, 0])
    np.testing.assert_allclose(np.asarray(det_2x2(rot)), np.ones(16), atol=1e-5)


def test_straight_through_forward_and_grad():
    acts = jnp.array([[0.1, 2.0, -1.0], [3.0, 0.0, 0.5]])
    onehot = straight_through_onehot(acts, beta=1.0, training=True)
    np.testing.assert_allclose(
        np.asarray(onehot), np.array([[0, 1, 0], [1, 0, 0]]), atol=1e-6
    )

    # gradient flows through the softmax path only
    def loss(a):
        oh = straight_through_onehot(a, beta=2.0, training=True)
        return jnp.sum(oh * jnp.arange(3.0))

    g = jax.grad(loss)(acts)
    soft = jax.nn.softmax(2.0 * acts, axis=-1)

    def soft_loss(a):
        return jnp.sum(jax.nn.softmax(2.0 * a, axis=-1) * jnp.arange(3.0))

    g_soft = jax.grad(soft_loss)(acts)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_soft), atol=1e-6)

    # eval mode: hard, no gradient
    hard = straight_through_onehot(acts, training=False)
    np.testing.assert_allclose(np.asarray(hard), np.asarray(onehot), atol=1e-6)
    g_eval = jax.grad(lambda a: jnp.sum(straight_through_onehot(a, training=False)))(acts)
    np.testing.assert_allclose(np.asarray(g_eval), 0.0, atol=1e-6)


def test_gumbel_is_onehot_and_differentiable():
    acts = jnp.ones((4, 8))
    oh = gumbel_softmax_onehot(acts, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(jnp.sum(oh, -1)), 1.0, atol=1e-6)
    assert np.all(np.isin(np.asarray(oh), [0.0, 1.0]) | (np.abs(np.asarray(oh)) < 1.1))
    g = jax.grad(
        lambda a: jnp.sum(gumbel_softmax_onehot(a, jax.random.key(0)) * jnp.arange(8.0))
    )(acts)
    assert np.any(np.abs(np.asarray(g)) > 0)


def test_select_onehot_dispatch():
    acts = jnp.array([[0.0, 1.0]])
    st = select_onehot(acts, gradient_trick="straight_through", training=True)
    np.testing.assert_allclose(np.asarray(st), [[0.0, 1.0]], atol=1e-6)
    with pytest.raises(ValueError):
        select_onehot(acts, gradient_trick="nope")


@pytest.mark.parametrize("n", [2, 3])
def test_son_rep_is_rotation(n):
    lie = LieParameterization("SOn", n)
    rng = np.random.default_rng(2)
    params = jnp.asarray(rng.normal(size=(5, n * (n - 1) // 2)).astype(np.float32))
    R = lie.get_group_rep(params)
    eye = np.broadcast_to(np.eye(n), (5, n, n))
    np.testing.assert_allclose(np.asarray(R @ jnp.swapaxes(R, 1, 2)), eye, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)


def test_sen_rep_structure():
    lie = LieParameterization("SEn", 3)
    params = jnp.asarray(np.random.default_rng(3).normal(size=(4, 6)).astype(np.float32))
    rep = lie.get_group_rep(params)
    assert rep.shape == (4, 4, 4)
    np.testing.assert_allclose(np.asarray(rep[:, 3, 3]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rep[:, 3, :3]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rep[:, :3, 3]), np.asarray(params[:, 3:]), atol=1e-5)


def test_son_rep_matches_torch_matrix_exp():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    params = rng.normal(size=(3, 3)).astype(np.float32)
    lie = LieParameterization("SOn", 3)
    ours = np.asarray(lie.get_group_rep(jnp.asarray(params)))
    from equiadapt_tpu.common.lie import son_bases

    bases = torch.tensor(son_bases(3))
    A = torch.einsum("bs,sij->bij", torch.tensor(params), bases)
    theirs = torch.matrix_exp(A).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
