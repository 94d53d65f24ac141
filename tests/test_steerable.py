"""Steerable network and continuous canonicalizer tests.

Anchors: irrep-1 output vectors must rotate with the input (exact at 90
degrees), and the steerable canonicalizer must produce a rotation-invariant
canonical image.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equiadapt_tpu.common.info import identity_metric, prior_regularization_loss
from equiadapt_tpu.images.canonicalization.continuous_group import (
    OptimizedSteerableImageCanonicalization,
    SteerableImageCanonicalization,
    steerable_optimization_loss,
)
from equiadapt_tpu.images.networks.conv import ConvNetwork
from equiadapt_tpu.images.networks.steerable import SteerableNetwork

KEY = jax.random.key(0)


def _x(b=2, h=17, w=17, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))


def rot90(x, k=1):
    return jnp.rot90(x, k=k, axes=(1, 2))


def test_steerable_network_vector_equivariance_90():
    net = SteerableNetwork(in_channels=3, out_channels=4, kernel_size=5, num_layers=1)
    x = _x()
    params = net.init(KEY, x)
    v = np.asarray(net.apply(params, x))  # (B, 2, 2)
    v_rot = np.asarray(net.apply(params, rot90(x, 1)))
    # under a 90-degree input rotation each irrep-1 vector rotates 90 degrees
    expect = np.stack([-v[..., 1], v[..., 0]], axis=-1)
    alt = np.stack([v[..., 1], -v[..., 0]], axis=-1)
    err_ccw = np.abs(v_rot - expect).max()
    err_cw = np.abs(v_rot - alt).max()
    assert min(err_ccw, err_cw) < 1e-4, (err_ccw, err_cw)


def test_steerable_canonicalizer_invariance():
    net = SteerableNetwork(in_channels=3, out_channels=4, kernel_size=5, num_layers=1)
    canon = SteerableImageCanonicalization(
        canonicalization_network=net, in_shape=(17, 17, 3), group_type="rotation"
    )
    x = _x()
    params = canon.init(KEY, x)
    x_c, info = canon.apply(params, x)
    assert info.matrix_rep.shape == (2, 2, 2)
    for k in [1, 2, 3]:
        x_ck, _ = canon.apply(params, rot90(x, k))
        np.testing.assert_allclose(np.asarray(x_ck), np.asarray(x_c), atol=1e-3)


def test_continuous_prior_loss_and_metric():
    net = SteerableNetwork(in_channels=3, out_channels=4, kernel_size=5, num_layers=1)
    canon = SteerableImageCanonicalization(
        canonicalization_network=net, in_shape=(17, 17, 3)
    )
    x = _x()
    params = canon.init(KEY, x)
    _, info = canon.apply(params, x)
    pl = float(prior_regularization_loss(info))
    im = float(identity_metric(info))
    assert np.isfinite(pl) and pl >= 0
    np.testing.assert_allclose(im, 1.0 - pl, atol=1e-5)


def test_optimized_steerable_runs_and_loss():
    net = ConvNetwork(in_channels=3, out_channels=8, kernel_size=3, num_layers=1,
                      out_vector_size=4)  # -> (B, 2, 2) vectors
    canon = OptimizedSteerableImageCanonicalization(
        canonicalization_network=net,
        in_shape=(16, 16, 3),
        group_type="roto-reflection",
    )
    x = _x(h=16, w=16)
    variables = canon.init(
        {"params": KEY, "augment": jax.random.key(1)}, x, training=True
    )
    (x_c, info), _ = canon.apply(
        variables, x, training=True,
        rngs={"augment": jax.random.key(2), "dropout": jax.random.key(3)},
        mutable=["batch_stats"],
    )
    assert x_c.shape == x.shape
    assert info.extras["matrix_rep_augmented"].shape == (2, 2, 2)
    assert info.extras["matrix_rep_augmented_gt"].shape == (2, 2, 2)
    loss = steerable_optimization_loss(info)
    assert np.isfinite(float(loss))


def test_optimized_steerable_gt_matrices_are_rotations():
    """The augmentation GT matrices should be orthogonal (det +-1)."""
    net = ConvNetwork(in_channels=3, out_channels=8, kernel_size=3, num_layers=1,
                      out_vector_size=4)
    canon = OptimizedSteerableImageCanonicalization(
        canonicalization_network=net, in_shape=(16, 16, 3), group_type="rotation"
    )
    x = _x(h=16, w=16)
    variables = canon.init({"params": KEY, "augment": jax.random.key(1)}, x, training=True)
    (_, info), _ = canon.apply(
        variables, x, training=True,
        rngs={"augment": jax.random.key(5), "dropout": jax.random.key(6)},
        mutable=["batch_stats"],
    )
    gt = np.asarray(info.extras["matrix_rep_augmented_gt"])
    eye = np.broadcast_to(np.eye(2), gt.shape)
    np.testing.assert_allclose(gt @ gt.transpose(0, 2, 1), eye, atol=1e-5)


def test_steerable_canonicalizer_approx_invariance_arbitrary_angle():
    """Non-90 rotations: invariance holds to interpolation tolerance."""
    from equiadapt_tpu.ops.warp import rotate

    net = SteerableNetwork(in_channels=1, out_channels=4, kernel_size=5, num_layers=1)
    canon = SteerableImageCanonicalization(
        canonicalization_network=net, in_shape=(33, 33, 1), group_type="rotation"
    )
    # smooth image so bilinear interpolation error is small
    yy, xx = np.meshgrid(np.linspace(-1, 1, 33), np.linspace(-1, 1, 33), indexing="ij")
    img = np.exp(-3 * (xx**2 + yy**2)) * (xx + 0.5 * yy)
    x = jnp.asarray(img[None, ..., None].astype(np.float32))
    params = canon.init(KEY, x)
    x_c, _ = canon.apply(params, x)
    x_rot = rotate(x, 25.0, padding_mode="zeros")
    x_cr, _ = canon.apply(params, x_rot)
    # compare central region (borders differ by fill)
    a = np.asarray(x_c)[0, 10:23, 10:23, 0]
    b = np.asarray(x_cr)[0, 10:23, 10:23, 0]
    assert np.abs(a - b).mean() < 0.05
