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


def test_vector_rep_action_rotates_field_and_channels():
    """Vector rep (extension — the reference raises NotImplementedError,
    images/utils.py:90-92): a constant vector field under a 90-degree
    element keeps its spatial constancy and its 2-vector channels rotate
    by R(theta)."""
    import jax.numpy as jnp
    import numpy as np

    from equiadapt_tpu.ops.group_action import get_action_on_image_features

    B, H = 4, 8
    # constant field v = (1, 0) everywhere, one 2-vector channel pair
    fm = jnp.concatenate(
        [jnp.ones((B, H, H, 1)), jnp.zeros((B, H, H, 1))], axis=-1
    )
    deg = jnp.asarray([0.0, 90.0, 180.0, 270.0])
    out = get_action_on_image_features(
        fm, num_rotations=4, num_group=4, rotation_deg=deg,
        induced_rep_type="vector",
    )
    # constant fields are invariant under the spatial warp; channels mix
    expected = np.asarray(
        [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]]
    )
    got = np.asarray(out[:, H // 2, H // 2, :])
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_vector_rep_invert_round_trip():
    """invert(g) then invert-with(-g-ish) returns the field: apply theta
    then -theta composes to identity away from borders."""
    import jax.numpy as jnp
    import numpy as np

    from equiadapt_tpu.ops.group_action import get_action_on_image_features

    rng = np.random.default_rng(0)
    fm = jnp.asarray(rng.normal(size=(3, 16, 16, 4)).astype(np.float32))
    deg = jnp.asarray([90.0, 180.0, 270.0])
    fwd = get_action_on_image_features(
        fm, num_rotations=4, num_group=4, rotation_deg=deg,
        induced_rep_type="vector",
    )
    back = get_action_on_image_features(
        fwd, num_rotations=4, num_group=4, rotation_deg=(360.0 - deg) % 360.0,
        induced_rep_type="vector",
    )
    np.testing.assert_allclose(np.asarray(back), np.asarray(fm), atol=1e-4)
