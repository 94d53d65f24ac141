"""Orbit materialization: exact path == warp path == reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equiadapt_tpu.ops.pallas.orbit import materialize_orbit, rot90_flip_orbit
from equiadapt_tpu.ops.warp import group_angles, hflip, rotate


def _x(b=2, h=16, w=16, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))


def test_exact_orbit_matches_warp_c4():
    x = _x()
    exact = rot90_flip_orbit(x, num_rotations=4)  # (4, B, H, W, C)
    degrees = group_angles(4)
    for g in range(4):
        warped = rotate(x, -degrees[g], padding_mode="border")
        np.testing.assert_allclose(
            np.asarray(exact[g]), np.asarray(warped), atol=1e-5
        )


def test_exact_orbit_d4_reflections():
    x = _x()
    orbit = rot90_flip_orbit(x, num_rotations=4, reflections=True)
    assert orbit.shape[0] == 8
    degrees = group_angles(4)
    for g in range(4):
        expect = hflip(rotate(x, -degrees[g], padding_mode="border"))
        np.testing.assert_allclose(
            np.asarray(orbit[4 + g]), np.asarray(expect), atol=1e-5
        )


def test_materialize_orbit_group_major_layout():
    x = _x(b=3)
    orbit = materialize_orbit(x, num_rotations=4, group_type="rotation")
    assert orbit.shape == (12, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(orbit[:3]), np.asarray(x), atol=0)


def test_materialize_orbit_c8_uses_warp():
    x = _x()
    orbit = materialize_orbit(x, num_rotations=8, group_type="rotation")
    assert orbit.shape == (16, 16, 16, 3)
    # element 2 of C8 is the 90-degree rotation: exact
    np.testing.assert_allclose(
        np.asarray(orbit[2 * 2 : 2 * 2 + 2]),
        np.asarray(jnp.rot90(x, -1, axes=(1, 2))),
        atol=1e-4,
    )


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="pallas TPU kernel needs TPU"
)
def test_pallas_orbit_matches_xla():
    x = _x()
    a = rot90_flip_orbit(x, num_rotations=4, use_pallas=True)
    b = rot90_flip_orbit(x, num_rotations=4, use_pallas=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_orbit_sign_convention_matches_group_inference():
    """sign=+1 orbit element g applies rotate(x, +theta_g) — the reference
    GroupInference convention (inference_utils.py:100-122), so
    test/acc_element_k labels are comparable across frameworks. sign=-1
    (default) keeps the canonicalizer's rotate(x, -theta_g)."""
    import jax
    import jax.numpy as jnp

    from equiadapt_tpu.ops.pallas.orbit import materialize_orbit
    from equiadapt_tpu.ops.warp import rotate

    x = jax.random.uniform(jax.random.key(0), (2, 16, 16, 3))
    for n in (4, 8):
        orbit = materialize_orbit(x, n, padding_mode="border", sign=1.0)
        G = orbit.shape[0] // 2
        for g in range(n):
            expect = rotate(x, jnp.full((2,), g * 360.0 / n), padding_mode="border")
            got = orbit[g * 2:(g + 1) * 2]
            assert float(jnp.abs(got - expect).max()) < 1e-5, (n, g)
