"""Bottleneck wide-resnet block equivariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equiadapt_tpu.images.networks.equivariant import EquivariantWideResNet


@pytest.mark.slow
def test_bottleneck_wrn_equivariance():
    net = EquivariantWideResNet(
        in_channels=3, out_channels=4, kernel_size=3, group_type="rotation",
        num_rotations=4, num_blocks=1, block_type="bottleneck",
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    params = net.init(jax.random.key(0), x)
    acts = net.apply(params, x)
    acts_rot = net.apply(params, jnp.rot90(x, 1, axes=(1, 2)))
    np.testing.assert_allclose(
        np.asarray(acts_rot), np.roll(np.asarray(acts), 1, axis=-1), atol=1e-4
    )
