"""roll_by_gather semantics vs a straightforward numpy reference."""

import jax.numpy as jnp
import numpy as np

from equiadapt_tpu.ops.group_action import roll_by_gather


def test_roll_matches_numpy_reference():
    rng = np.random.default_rng(0)
    B, H, W, C, G = 3, 4, 5, 2, 8
    x = rng.normal(size=(B, H, W, C, G)).astype(np.float32)
    shifts = np.array([0, 3, -2])
    out = np.asarray(roll_by_gather(jnp.asarray(x), jnp.asarray(shifts)))
    for b, s in enumerate(shifts):
        # out[..., g] = x[..., (g - s) % G]  == np.roll along the fiber by +s
        np.testing.assert_allclose(out[b], np.roll(x[b], s, axis=-1), atol=1e-6)


def test_roll_float_shifts_truncate():
    x = jnp.arange(8.0).reshape(1, 1, 1, 1, 8)
    out = np.asarray(roll_by_gather(x, jnp.asarray([1.0])))
    np.testing.assert_allclose(out[0, 0, 0, 0], np.roll(np.arange(8.0), 1))
