"""Discrete image canonicalizer tests.

Go beyond the reference's execution-only tests
(reference tests/images/canonicalization/test_discrete_group.py:44-69):
assert *invariance* of the canonicalized image under exact group transforms,
*equivariance* of the full canonicalize -> predict -> invert pipeline, and
the invert composition law — the functional-parity contract of BASELINE.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equiadapt_tpu.common.info import (
    DiscreteCanonicalizationInfo,
    DiscreteGroupElement,
    identity_metric,
    prior_regularization_loss,
)
from equiadapt_tpu.images import (
    ConvNetwork,
    EquivariantNetwork,
    GroupEquivariantImageCanonicalization,
    OptimizedGroupEquivariantImageCanonicalization,
    optimization_specific_loss,
)

KEY = jax.random.key(0)


def _x(b=3, h=16, w=16, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))


def rot90(x, k=1):
    return jnp.rot90(x, k=k, axes=(1, 2))


def _c4_canonicalizer(num_rotations=4, group_type="rotation"):
    net = EquivariantNetwork(
        in_channels=3, out_channels=8, kernel_size=3, group_type=group_type,
        num_rotations=num_rotations, num_layers=2,
    )
    return GroupEquivariantImageCanonicalization(
        canonicalization_network=net,
        in_shape=(16, 16, 3),
        num_rotations=num_rotations,
        group_type=group_type,
        beta=1.0,
    )


def test_canonicalized_image_invariant_under_c4():
    canon = _c4_canonicalizer()
    x = _x()
    params = canon.init(KEY, x)
    x_c, info = canon.apply(params, x)
    assert x_c.shape == x.shape
    assert info.group_activations.shape == (3, 4)
    for k in [1, 2, 3]:
        x_ck, info_k = canon.apply(params, rot90(x, k))
        np.testing.assert_allclose(np.asarray(x_ck), np.asarray(x_c), atol=1e-3)
        # selected element shifts by the applied rotation
        sel = np.argmax(np.asarray(info.group_activations), -1)
        sel_k = np.argmax(np.asarray(info_k.group_activations), -1)
        np.testing.assert_array_equal((sel + k) % 4, sel_k)


def test_canonicalized_image_invariant_under_d4():
    canon = _c4_canonicalizer(group_type="roto-reflection")
    x = _x()
    params = canon.init(KEY, x)
    x_c, _ = canon.apply(params, x)
    x_cr, _ = canon.apply(params, x[:, :, ::-1, :])  # hflip
    np.testing.assert_allclose(np.asarray(x_cr), np.asarray(x_c), atol=1e-3)
    x_ck, _ = canon.apply(params, rot90(x, 2))
    np.testing.assert_allclose(np.asarray(x_ck), np.asarray(x_c), atol=1e-3)


@pytest.mark.parametrize("group_type", ["rotation", "roto-reflection"])
def test_invert_composition_law(group_type):
    """invert(g2) . invert(g1) == invert(g2 * g1) for pure rotations (exact 90s)."""
    canon = _c4_canonicalizer(group_type=group_type)
    G = 8 if group_type == "roto-reflection" else 4
    B, C = 2, 2 * G
    y = _x(B, 12, 12, C, seed=5)

    def info_rot(k):
        return DiscreteCanonicalizationInfo(
            group_activations=jnp.zeros((B, G)),
            onehot=jnp.zeros((B, G)),
            element=DiscreteGroupElement(
                rotation_deg=jnp.full((B,), 90.0 * k),
                reflection=jnp.zeros((B,)) if group_type == "roto-reflection" else None,
            ),
            num_rotations=4,
            group_type=group_type,
        )

    params = {}  # invert needs no params
    a = canon.invert_canonicalization(info_rot(1), y)
    a = canon.invert_canonicalization(info_rot(2), a)
    b = canon.invert_canonicalization(info_rot(3), y)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_invert_reflection_round_trip():
    """Applying the same reflection element twice is the identity (m^2 = e)."""
    canon = _c4_canonicalizer(group_type="roto-reflection")
    B, G = 2, 8
    y = _x(B, 12, 12, 16, seed=6)
    info = DiscreteCanonicalizationInfo(
        group_activations=jnp.zeros((B, G)),
        onehot=jnp.zeros((B, G)),
        element=DiscreteGroupElement(
            rotation_deg=jnp.zeros((B,)), reflection=jnp.ones((B,))
        ),
        num_rotations=4,
        group_type="roto-reflection",
    )
    out = canon.invert_canonicalization(info, canon.invert_canonicalization(info, y))
    np.testing.assert_allclose(np.asarray(out), np.asarray(y), atol=1e-4)


def test_pipeline_equivariance_regular_rep():
    """invert(info(g.x), f(canon(g.x))) == action_g(invert(info(x), f(canon(x))))."""
    canon = _c4_canonicalizer()
    x = _x(b=2)
    params = canon.init(KEY, x)

    def f(z):  # any fixed function producing a regular-rep-shaped output
        return jnp.concatenate([z, z * 0.5, z**2, jnp.roll(z, 1, axis=-1)], axis=-1)[
            ..., :8
        ]

    def pipeline(inp):
        x_c, info = canon.apply(params, inp)
        return canon.invert_canonicalization(info, f(x_c)), info

    y, info = pipeline(x)
    y_rot, info_rot = pipeline(rot90(x, 1))

    act_info = DiscreteCanonicalizationInfo(
        group_activations=info.group_activations,
        onehot=info.onehot,
        element=DiscreteGroupElement(
            rotation_deg=jnp.full((2,), 90.0), reflection=None
        ),
        num_rotations=4,
        group_type="rotation",
    )
    expected = canon.invert_canonicalization(act_info, y)
    np.testing.assert_allclose(np.asarray(y_rot), np.asarray(expected), atol=1e-3)


def test_prior_loss_and_identity_metric():
    acts = jnp.array([[5.0, 0.0, 0.0, 0.0], [0.0, 5.0, 0.0, 0.0]])
    info = DiscreteCanonicalizationInfo(
        group_activations=acts,
        onehot=jax.nn.one_hot(jnp.argmax(acts, -1), 4),
        element=DiscreteGroupElement(rotation_deg=jnp.zeros(2)),
        num_rotations=4,
    )
    assert 0.0 < float(prior_regularization_loss(info))
    np.testing.assert_allclose(float(identity_metric(info)), 0.5)


def test_optimized_canonicalizer_runs_and_orbit_scores():
    net = ConvNetwork(in_channels=3, out_channels=8, kernel_size=3,
                      num_layers=1, out_vector_size=32)
    canon = OptimizedGroupEquivariantImageCanonicalization(
        canonicalization_network=net,
        in_shape=(16, 16, 3),
        num_rotations=4,
        group_type="rotation",
        out_vector_size=32,
        artifact_err_wt=0.1,
    )
    x = _x()
    variables = canon.init(
        {"params": KEY, "artifact": jax.random.key(1), "dropout": jax.random.key(2)},
        x, training=True,
    )
    (x_c, info), _ = canon.apply(
        variables, x, training=True,
        rngs={"artifact": jax.random.key(3), "dropout": jax.random.key(4)},
        mutable=["batch_stats"],
    )
    assert x_c.shape == x.shape
    assert info.group_activations.shape == (3, 4)
    assert info.extras["vector_out"].shape == (12, 32)
    loss = optimization_specific_loss(info, out_vector_size=32, artifact_err_wt=0.1)
    assert np.isfinite(float(loss))


def test_gumbel_trick_canonicalizer():
    net = EquivariantNetwork(
        in_channels=3, out_channels=4, kernel_size=3, group_type="rotation",
        num_rotations=4, num_layers=2,
    )
    canon = GroupEquivariantImageCanonicalization(
        canonicalization_network=net,
        in_shape=(16, 16, 3),
        num_rotations=4,
        gradient_trick="gumbel_softmax",
    )
    x = _x()
    variables = canon.init({"params": KEY, "gumbel": jax.random.key(1)}, x, training=True)
    (x_c, info), _ = canon.apply(
        variables, x, training=True,
        rngs={"gumbel": jax.random.key(2), "dropout": jax.random.key(3)},
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.asarray(jnp.sum(info.onehot, -1)), 1.0, atol=1e-5)


def test_optimized_canonicalizer_selection_shifts_under_rotation():
    """Orbit-scoring selection obeys the regular-rep shift law at exact 90s."""
    net = ConvNetwork(in_channels=3, out_channels=8, kernel_size=3,
                      num_layers=1, out_vector_size=16)
    canon = OptimizedGroupEquivariantImageCanonicalization(
        canonicalization_network=net, in_shape=(16, 16, 3),
        num_rotations=4, group_type="rotation", out_vector_size=16,
    )
    x = _x(b=2)
    variables = canon.init({"params": KEY, "dropout": jax.random.key(1)}, x)
    _, info = canon.apply(variables, x)
    _, info_rot = canon.apply(variables, rot90(x, 1))
    sel = np.argmax(np.asarray(info.group_activations), -1)
    sel_rot = np.argmax(np.asarray(info_rot.group_activations), -1)
    np.testing.assert_array_equal((sel + 1) % 4, sel_rot)


def test_nchw_energy_hook_matches_nhwc_path():
    """get_group_activations_nchw (NCHW crop/resize spine) selects the same
    group elements as the NHWC energy path and matches its activations to
    float rounding."""
    import math

    from equiadapt_tpu.images import (
        EquivariantNetwork, GroupEquivariantImageCanonicalization,
    )

    net = EquivariantNetwork(
        in_channels=3, out_channels=8, kernel_size=3, group_type="rotation",
        num_rotations=8, num_layers=2,
    )
    canon = GroupEquivariantImageCanonicalization(
        canonicalization_network=net, in_shape=(32, 32, 3),
        input_crop_ratio=0.9, resize_shape=16,
        num_rotations=8, group_type="rotation",
    )
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    params = canon.init(jax.random.key(0), x, training=False)

    def nhwc(m, a, training):
        return m.get_group_activations(a, training)[0]

    def nchw(m, a, training):
        return m.get_group_activations_nchw(a, training)[0]

    acts_ref = canon.apply(params, x, False, method=nhwc)
    acts_nchw = canon.apply(params, jnp.moveaxis(x, -1, 1), False, method=nchw)
    np.testing.assert_allclose(
        np.asarray(acts_nchw), np.asarray(acts_ref), rtol=1e-5, atol=1e-5
    )
    assert np.array_equal(
        np.argmax(np.asarray(acts_nchw), -1), np.argmax(np.asarray(acts_ref), -1)
    )


@pytest.mark.parametrize("warp_mode,group_type,n", [
    ("fast", "rotation", 8),
    ("exact", "rotation", 8),
    ("fast", "roto-reflection", 4),
])
def test_nchw_spine_canonicalize_matches_nhwc_path(
    monkeypatch, warp_mode, group_type, n
):
    """EQUIADAPT_NCHW_SPINE=interpret drives the TPU serving branch
    end-to-end on CPU: selected elements match the generic path and the
    canonicalized images are bit-identical (crop_ratio 1.0 keeps the
    NCHW/NHWC resize identical; the warp is bit-exact by construction)."""
    from equiadapt_tpu.images import (
        EquivariantNetwork, GroupEquivariantImageCanonicalization,
    )

    net = EquivariantNetwork(
        in_channels=3, out_channels=4, kernel_size=3, group_type=group_type,
        num_rotations=n, num_layers=2,
    )
    canon = GroupEquivariantImageCanonicalization(
        canonicalization_network=net, in_shape=(24, 24, 3),
        input_crop_ratio=1.0, resize_shape=16,
        num_rotations=n, group_type=group_type, warp_mode=warp_mode,
    )
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(5, 24, 24, 3)).astype(np.float32))
    params = canon.init(jax.random.key(0), x, training=False)

    monkeypatch.setenv("EQUIADAPT_NCHW_SPINE", "never")
    x_ref, info_ref = canon.apply(params, x, training=False)
    monkeypatch.setenv("EQUIADAPT_NCHW_SPINE", "interpret")
    x_spine, info_spine = canon.apply(params, x, training=False)

    assert np.array_equal(
        np.asarray(info_spine.element.rotation_deg),
        np.asarray(info_ref.element.rotation_deg),
    )
    assert bool((x_spine == x_ref).all())


def test_output_dtype_compute_keeps_bf16():
    """output_dtype="compute" hands the canonicalized batch to the
    prediction network in compute_dtype (values identical to casting the
    default fp32 output back down — bf16->fp32->bf16 is the identity)."""
    from equiadapt_tpu.images import (
        EquivariantNetwork, GroupEquivariantImageCanonicalization,
    )

    net = EquivariantNetwork(
        in_channels=3, out_channels=4, kernel_size=3, group_type="rotation",
        num_rotations=4, num_layers=2,
    )

    def make(output_dtype):
        return GroupEquivariantImageCanonicalization(
            canonicalization_network=net, in_shape=(16, 16, 3),
            num_rotations=4, group_type="rotation", warp_mode="fast",
            compute_dtype=jnp.bfloat16, output_dtype=output_dtype,
        )

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(4, 16, 16, 3)).astype(np.float32))
    params = make(None).init(jax.random.key(0), x, training=False)
    x_ref, info_ref = make(None).apply(params, x, training=False)
    x_out, info_out = make("compute").apply(params, x, training=False)
    assert x_ref.dtype == jnp.float32
    assert x_out.dtype == jnp.bfloat16
    assert bool((x_out == x_ref.astype(jnp.bfloat16)).all())
    assert np.array_equal(
        np.asarray(info_out.element.rotation_deg),
        np.asarray(info_ref.element.rotation_deg),
    )
