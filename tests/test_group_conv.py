"""Equivariance property tests for the GCNN layers and energy networks.

The reference ships no equivariance assertions (SURVEY.md §4); these tests
are the ground truth for our fiber conventions: for exact 90-degree
transformations the group activations must permute by the regular
representation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equiadapt_tpu.images.networks.equivariant import (
    CustomEquivariantNetwork,
    EquivariantNetwork,
    EquivariantWideResNet,
)

KEY = jax.random.key(0)


def _x(b=2, h=17, w=17, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))


def rot90(x, k=1):
    return jnp.rot90(x, k=k, axes=(1, 2))


def hflip(x):
    return x[:, :, ::-1, :]


def test_equivariant_network_c4_rotation_equivariance():
    net = EquivariantNetwork(
        in_channels=3, out_channels=8, kernel_size=3, group_type="rotation",
        num_rotations=4, num_layers=2,
    )
    x = _x()
    params = net.init(KEY, x)
    acts = net.apply(params, x)
    assert acts.shape == (2, 4)
    for j in [1, 2, 3]:
        acts_rot = net.apply(params, rot90(x, j))
        # acts'(g) = acts(g - j)  =>  acts' = roll(acts, j)
        np.testing.assert_allclose(
            np.asarray(acts_rot), np.roll(np.asarray(acts), j, axis=-1), atol=1e-4
        )


def test_custom_equivariant_network_c4():
    net = CustomEquivariantNetwork(
        in_channels=3, out_channels=8, kernel_size=5, group_type="rotation",
        num_rotations=4, num_layers=3,
    )
    x = _x(h=15, w=15)
    params = net.init(KEY, x)
    acts = net.apply(params, x)
    acts_rot = net.apply(params, rot90(x, 1))
    np.testing.assert_allclose(
        np.asarray(acts_rot), np.roll(np.asarray(acts), 1, axis=-1), atol=1e-4
    )


def test_equivariant_network_d4_rotation_and_reflection():
    n = 4
    net = EquivariantNetwork(
        in_channels=3, out_channels=4, kernel_size=3, group_type="roto-reflection",
        num_rotations=n, num_layers=3,
    )
    x = _x()
    params = net.init(KEY, x)
    acts = np.asarray(net.apply(params, x))
    assert acts.shape == (2, 2 * n)

    # rotation r_j: rotation fibers roll by +j, reflection fibers by -j
    for j in [1, 3]:
        acts_rot = np.asarray(net.apply(params, rot90(x, j)))
        expect = np.concatenate(
            [np.roll(acts[:, :n], j, axis=-1), np.roll(acts[:, n:], -j, axis=-1)],
            axis=-1,
        )
        np.testing.assert_allclose(acts_rot, expect, atol=1e-4)

    # reflection m: acts'(r_k) = acts(m r_k), acts'(m r_k) = acts(r_k)
    acts_ref = np.asarray(net.apply(params, hflip(x)))
    expect = np.concatenate([acts[:, n:], acts[:, :n]], axis=-1)
    np.testing.assert_allclose(acts_ref, expect, atol=1e-4)


def test_wide_resnet_equivariance_c4():
    net = EquivariantWideResNet(
        in_channels=3, out_channels=4, kernel_size=3, group_type="rotation",
        num_rotations=4, num_blocks=1,
    )
    x = _x(h=16, w=16)
    params = net.init(KEY, x)
    acts = net.apply(params, x)
    acts_rot = net.apply(params, rot90(x, 1))
    np.testing.assert_allclose(
        np.asarray(acts_rot), np.roll(np.asarray(acts), 1, axis=-1), atol=1e-4
    )


def test_c8_approximate_equivariance():
    """45-degree filters are bilinear-interpolated; equivariance holds only
    approximately for non-90-multiples but must be exact for 90s even in C8."""
    net = EquivariantNetwork(
        in_channels=3, out_channels=4, kernel_size=3, group_type="rotation",
        num_rotations=8, num_layers=2,
    )
    x = _x()
    params = net.init(KEY, x)
    acts = np.asarray(net.apply(params, x))
    acts_rot = np.asarray(net.apply(params, rot90(x, 1)))  # 90 deg = 2 steps of C8
    np.testing.assert_allclose(acts_rot, np.roll(acts, 2, axis=-1), atol=1e-4)


def test_equivariant_network_pool_after_lift_keeps_c4_equivariance():
    """The 2x2/s2 avg pool after the lift (the serving-mode energy config)
    commutes exactly with rot90 on even sizes, so C4 equivariance of the
    activations is preserved bit-for-bit in structure (allclose in fp32)."""
    net = EquivariantNetwork(
        in_channels=3, out_channels=8, kernel_size=3, group_type="rotation",
        num_rotations=4, num_layers=2, pool_after_lift=True,
    )
    x = jax.random.uniform(KEY, (2, 16, 16, 3))
    params = net.init(KEY, x)
    acts = net.apply(params, x)
    assert acts.shape == (2, 4)
    for j in [1, 2, 3]:
        acts_rot = net.apply(params, rot90(x, j))
        np.testing.assert_allclose(
            np.asarray(acts_rot), np.roll(np.asarray(acts), j, axis=-1), atol=1e-4
        )


def test_equivariant_network_pool_after_lift_c8_roll():
    """C8: rot90 = 2 steps of the fiber roll; pooling must not break it."""
    net = EquivariantNetwork(
        in_channels=3, out_channels=4, kernel_size=3, group_type="rotation",
        num_rotations=8, num_layers=2, pool_after_lift=True,
    )
    x = jax.random.uniform(KEY, (2, 16, 16, 3))
    params = net.init(KEY, x)
    acts = np.asarray(net.apply(params, x))
    acts_rot = np.asarray(net.apply(params, rot90(x, 1)))
    np.testing.assert_allclose(acts_rot, np.roll(acts, 2, axis=-1), atol=1e-4)


def test_fused_pool_lift_equals_pool_then_conv():
    """_fold_avg_pool correctness: the stride-2 folded-filter lift equals
    avg_pool2x2s2 of the plain lift output exactly (same params — only the
    fp32 summation order differs)."""
    from equiadapt_tpu.images.networks.group_conv import (
        RotationEquivariantConvLift,
    )

    x = jax.random.uniform(KEY, (2, 16, 16, 3))
    plain = RotationEquivariantConvLift(
        in_channels=3, out_channels=4, kernel_size=3, num_rotations=4,
    )
    fused = RotationEquivariantConvLift(
        in_channels=3, out_channels=4, kernel_size=3, num_rotations=4,
        fused_pool=True,
    )
    params = plain.init(KEY, x)
    import flax.linen as nn

    ref = nn.avg_pool(plain.apply(params, x), (2, 2), strides=(2, 2))
    out = fused.apply(params, x)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("n,steps", [(4, 1), (8, 2)])
def test_equivariant_network_fused_pool_lift_equivariance(n, steps):
    """The folded-pool lift inherits exact rot90 equivariance from its
    pool-after-conv factorization (both factors commute with rot90 on
    even grids)."""
    net = EquivariantNetwork(
        in_channels=3, out_channels=8, kernel_size=3, group_type="rotation",
        num_rotations=n, num_layers=2, fused_pool_lift=True,
    )
    x = jax.random.uniform(KEY, (2, 16, 16, 3))
    params = net.init(KEY, x)
    acts = np.asarray(net.apply(params, x))
    acts_rot = np.asarray(net.apply(params, rot90(x, 1)))
    np.testing.assert_allclose(acts_rot, np.roll(acts, steps, axis=-1), atol=1e-4)
