"""Prediction-network smoke tests: shapes, finiteness, train/eval modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equiadapt_tpu.models import (
    DGCNN,
    DGCNNPartSeg,
    GNN,
    NBodyTransformer,
    PointNet,
    ResNet18,
    ResNet50,
    ViT,
)

KEY = jax.random.key(0)


def _finite(x):
    assert np.isfinite(np.asarray(x)).all()


def test_resnet18_small_images():
    m = ResNet18(num_classes=10, small_images=True)
    x = jnp.zeros((2, 32, 32, 3))
    params = m.init(KEY, x)
    y = m.apply(params, x)
    assert y.shape == (2, 10)
    _finite(y)


@pytest.mark.slow
def test_resnet50_stem():
    m = ResNet50(num_classes=7)
    x = jnp.zeros((2, 64, 64, 3))
    params = m.init(KEY, x)
    y = m.apply(params, x)
    assert y.shape == (2, 7)


def test_vit_tiny():
    m = ViT(num_classes=5, patch_size=8, hidden_dim=32, num_layers=2,
            num_heads=2, mlp_dim=64)
    x = jnp.zeros((2, 32, 32, 3))
    params = m.init(KEY, x)
    y = m.apply(params, x)
    assert y.shape == (2, 5)


@pytest.mark.slow
def test_pointnet_and_dgcnn():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    pn = PointNet(num_classes=40, emb_dims=64)
    params = pn.init(KEY, pts)
    y = pn.apply(params, pts)
    assert y.shape == (2, 40)
    _finite(y)

    dg = DGCNN(num_classes=40, k=8, emb_dims=64)
    params = dg.init(KEY, pts)
    y = dg.apply(params, pts)
    assert y.shape == (2, 40)
    _finite(y)


@pytest.mark.slow
def test_dgcnn_partseg():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    cat = jax.nn.one_hot(jnp.array([0, 3]), 16)
    m = DGCNNPartSeg(num_parts=50, k=8, emb_dims=64)
    params = m.init(KEY, pts, cat)
    y = m.apply(params, pts, cat)
    assert y.shape == (2, 64, 50)
    _finite(y)


@pytest.mark.slow
def test_gnn_and_transformer():
    rng = np.random.default_rng(2)
    loc = jnp.asarray(rng.normal(size=(2, 5, 3)).astype(np.float32))
    vel = jnp.asarray(rng.normal(size=(2, 5, 3)).astype(np.float32))
    charges = jnp.asarray(rng.choice([-1.0, 1.0], size=(2, 5, 1)).astype(np.float32))

    gnn = GNN(hidden_dim=16, num_layers=2)
    params = gnn.init(KEY, loc, vel, charges)
    y = gnn.apply(params, loc, vel, charges)
    assert y.shape == (2, 5, 3)
    _finite(y)

    tr = NBodyTransformer(hidden_dim=8, num_layers=1, nheads=2, ff_hidden=32)
    params = tr.init(KEY, loc, vel, charges)
    y = tr.apply(params, loc, vel, charges)
    assert y.shape == (2, 5, 3)
    _finite(y)
