"""KernelOptions: validation, scoping, and the tested knob matrix.

Round-4 verdict item 5: the kernel-path switches (formerly six ad-hoc
``EQUIADAPT_*`` env reads) must be a typed config with an explicitly tested
combination matrix — the round-4 TPU fault shipped through an untested
combination. ``option_matrix()`` is the supported cross product; every
combination must produce the same selected group elements and (for the
bit-exactness-claimed knobs) bit-identical canonicalized images as the
default configuration. The real-hardware leg of the same matrix runs as
``bench.py --smoke`` each round.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equiadapt_tpu.kernel_options import (
    KernelOptions,
    current_kernel_options,
    kernel_options,
    option_matrix,
)


def test_defaults_are_validated_taps_and_no_spine():
    opts = KernelOptions()
    assert opts.bilinear_gather == "taps"  # round-4 fault fix: slab opt-in
    assert opts.nchw_spine == "never"


@pytest.mark.parametrize("field,value", [
    ("bilinear_gather", "slabs"),
    ("nchw_spine", "always"),
    ("spine_barrier", "yes"),
    ("select_layout", "chwn"),
    ("rot90_strategy", "bf16"),
    ("exact_warp", "fused"),
    ("select_pair", 0),
])
def test_invalid_values_raise(field, value):
    with pytest.raises(ValueError):
        KernelOptions(**{field: value})


def test_env_fallback_and_validation(monkeypatch):
    monkeypatch.setenv("EQUIADAPT_BILINEAR_GATHER", "slab")
    assert current_kernel_options().bilinear_gather == "slab"
    monkeypatch.setenv("EQUIADAPT_BILINEAR_GATHER", "slabby")
    with pytest.raises(ValueError):
        current_kernel_options()
    monkeypatch.setenv("EQUIADAPT_BILINEAR_GATHER", "taps")
    monkeypatch.setenv("EQUIADAPT_SELECT_PAIR", "three")
    with pytest.raises(ValueError):
        current_kernel_options()


def test_context_overrides_env_and_nests(monkeypatch):
    monkeypatch.setenv("EQUIADAPT_ROT90_STRATEGY", "fp32")
    assert current_kernel_options().rot90_strategy == "fp32"
    with kernel_options(rot90_strategy="mixed"):
        assert current_kernel_options().rot90_strategy == "mixed"
        with kernel_options(select_pair=4):
            inner = current_kernel_options()
            assert inner.rot90_strategy == "mixed"  # inherited from outer ctx
            assert inner.select_pair == 4
        assert current_kernel_options().select_pair == 2
    assert current_kernel_options().rot90_strategy == "fp32"


# ---------------------------------------------------------------------------
# The knob matrix, end-to-end through the discrete image canonicalizer
# ---------------------------------------------------------------------------

N_ROT = 4
SHAPE = (16, 16, 3)


@pytest.fixture(scope="module")
def discrete_setup():
    from equiadapt_tpu.images import (
        EquivariantNetwork,
        GroupEquivariantImageCanonicalization,
    )

    net = EquivariantNetwork(
        in_channels=3, out_channels=4, kernel_size=3, group_type="rotation",
        num_rotations=N_ROT, num_layers=2,
    )

    def make(warp_mode):
        return GroupEquivariantImageCanonicalization(
            canonicalization_network=net, in_shape=SHAPE,
            input_crop_ratio=1.0, resize_shape=None,
            num_rotations=N_ROT, group_type="rotation", warp_mode=warp_mode,
        )

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(3, *SHAPE)).astype(np.float32))
    params = make("exact").init(jax.random.key(0), x, training=False)
    return make, params, x


@pytest.mark.parametrize("warp_mode", ["fast", "exact"])
def test_matrix_discrete_canonicalize_invariant(discrete_setup, warp_mode):
    """Every supported knob combination canonicalizes identically."""
    make, params, x = discrete_setup
    canon = make(warp_mode)
    x_ref, info_ref = canon.apply(params, x, training=False)
    deg_ref = np.asarray(info_ref.element.rotation_deg)
    for opts in option_matrix():
        with kernel_options(**{
            f: getattr(opts, f)
            for f in ("bilinear_gather", "nchw_spine", "select_layout")
        }):
            x_c, info = canon.apply(params, x, training=False)
        label = repr(opts)
        assert np.array_equal(
            np.asarray(info.element.rotation_deg), deg_ref
        ), label
        # the spine and gather forms are claimed bit-identical on the
        # square crop-1.0 configuration
        assert bool((x_c == x_ref).all()), label


@pytest.mark.parametrize("warp_mode", ["fast", "exact"])
def test_matrix_continuous_canonicalize_invariant(warp_mode):
    """The continuous (steerable) family under both gather forms and both
    exact_warp implementations — the round-4 fault was in exactly this
    family's exact path."""
    from equiadapt_tpu.images.canonicalization.continuous_group import (
        SteerableImageCanonicalization,
    )
    from equiadapt_tpu.images.networks.steerable import SteerableNetwork

    net = SteerableNetwork(
        in_channels=3, out_channels=4, kernel_size=5, num_layers=1
    )
    canon = SteerableImageCanonicalization(
        canonicalization_network=net, in_shape=SHAPE,
        input_crop_ratio=1.0, resize_shape=None, warp_mode=warp_mode,
    )
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(3, *SHAPE)).astype(np.float32))
    params = canon.init(jax.random.key(1), x, training=False)
    x_ref, info_ref = canon.apply(params, x, training=False)
    for gather in ("taps", "slab"):
        for exact_warp in ("pallas", "xla"):
            with kernel_options(bilinear_gather=gather, exact_warp=exact_warp):
                x_c, info = canon.apply(params, x, training=False)
            label = f"gather={gather} exact_warp={exact_warp}"
            assert np.allclose(
                np.asarray(info.matrix_rep),
                np.asarray(info_ref.matrix_rep),
                atol=1e-6,
            ), label
            assert bool((x_c == x_ref).all()), label
