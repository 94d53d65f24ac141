"""N-body VN-DeepSets and SE(3) canonicalization tests.

Anchor property (absent from the reference's test suite): under a global
roto-translation loc -> loc @ Q + s, vel -> vel @ Q, the canonicalized
(loc, vel) are invariant and invert maps canonical predictions back
equivariantly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equiadapt_tpu.common.lie import son_rep
from equiadapt_tpu.nbody import EuclideanGroupNBody, VNDeepSets, complete_adjacency

KEY = jax.random.key(0)


def _data(b=3, n=5, seed=0):
    rng = np.random.default_rng(seed)
    loc = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    vel = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    charges = jnp.asarray(rng.choice([-1.0, 1.0], size=(b, n, 1)).astype(np.float32))
    return loc, vel, charges


def _rot(b=3, seed=7):
    rng = np.random.default_rng(seed)
    return son_rep(jnp.asarray(rng.normal(size=(b, 3)).astype(np.float32)), 3)


@pytest.mark.parametrize("canon_feature", ["p", "pv", "pva", "pvc", "pvac"])
def test_vndeepsets_feature_variants_run(canon_feature):
    net = VNDeepSets(hidden_dim=8, num_layers=2, canon_feature=canon_feature)
    loc, vel, charges = _data()
    params = net.init(KEY, loc, vel, charges)
    vec, t = net.apply(params, loc, vel, charges)
    assert vec.shape == (3, 3, 3)
    assert t.shape == (3, 3)
    assert np.isfinite(np.asarray(vec)).all()


def test_vndeepsets_equivariance():
    net = VNDeepSets(hidden_dim=8, num_layers=3, canon_feature="pv")
    loc, vel, charges = _data()
    params = net.init(KEY, loc, vel, charges)
    Q = _rot()
    s = jnp.asarray(np.random.default_rng(1).normal(size=(3, 1, 3)).astype(np.float32))
    vec, t = net.apply(params, loc, vel, charges)
    vec2, t2 = net.apply(
        params, jnp.einsum("bnd,bdw->bnw", loc, Q) + s, jnp.einsum("bnd,bdw->bnw", vel, Q), charges
    )
    # channel frame vectors rotate; translation (mean loc) roto-translates
    np.testing.assert_allclose(
        np.asarray(vec2), np.asarray(jnp.einsum("bkd,bdw->bkw", vec, Q)), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(t2), np.asarray(jnp.einsum("bd,bdw->bw", t, Q) + s[:, 0]), atol=1e-4
    )


def test_nbody_canonicalization_invariance_and_invert():
    net = VNDeepSets(hidden_dim=8, num_layers=2, canon_feature="pv")
    canon = EuclideanGroupNBody(canonicalization_network=net)
    loc, vel, charges = _data()
    nodes = jnp.linalg.norm(vel, axis=-1, keepdims=True)
    params = canon.init(KEY, nodes, loc=loc, vel=vel, charges=charges)
    (cl, cv), info = canon.apply(params, nodes, loc=loc, vel=vel, charges=charges)

    Q = _rot()
    s = jnp.asarray(np.random.default_rng(2).normal(size=(3, 1, 3)).astype(np.float32))
    loc2 = jnp.einsum("bnd,bdw->bnw", loc, Q) + s
    vel2 = jnp.einsum("bnd,bdw->bnw", vel, Q)
    (cl2, cv2), info2 = canon.apply(params, nodes, loc=loc2, vel=vel2, charges=charges)
    np.testing.assert_allclose(np.asarray(cl2), np.asarray(cl), atol=1e-3)
    np.testing.assert_allclose(np.asarray(cv2), np.asarray(cv), atol=1e-3)

    # invert is the exact inverse of canonicalize on locations
    back = canon.invert_canonicalization(info, cl)
    np.testing.assert_allclose(np.asarray(back), np.asarray(loc), atol=1e-4)

    # prediction equivariance: invert(info(g.x), y) == g(invert(info(x), y))
    y = jnp.asarray(np.random.default_rng(3).normal(size=(3, 5, 3)).astype(np.float32))
    out1 = canon.invert_canonicalization(info, y)
    out2 = canon.invert_canonicalization(info2, y)
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(jnp.einsum("bnd,bdw->bnw", out1, Q) + s), atol=1e-3
    )


def test_vndeepsets_prediction_mode():
    net = VNDeepSets(hidden_dim=8, num_layers=2, canon_feature="pv", out_dim=1)
    loc, vel, charges = _data()
    params = net.init(KEY, loc, vel, charges)
    out = net.apply(params, loc, vel, charges)
    assert out.shape == (3, 5, 3)


def test_complete_adjacency():
    a = np.asarray(complete_adjacency(4))
    assert a.sum() == 12
    assert np.trace(a) == 0
