"""Analytic FLOP counter (utils/flops.py) — the MFU denominator.

XLA ``cost_analysis()`` yields no flops on the bench backend (round-4
verdict item 4), so MFU is computed from this jaxpr walker. These tests pin
it against closed-form counts and the published ResNet-50 number.
"""

import jax
import jax.numpy as jnp
import pytest

from equiadapt_tpu.utils.flops import count_flops, resnet50_eval_flops


def test_dot_general():
    a, b = jnp.zeros((4, 8)), jnp.zeros((8, 16))
    assert count_flops(lambda x, y: x @ y, a, b) == 2 * 4 * 8 * 16


def test_batched_dot():
    a, b = jnp.zeros((3, 4, 8)), jnp.zeros((3, 8, 16))
    assert (
        count_flops(lambda x, y: jnp.einsum("bij,bjk->bik", x, y), a, b)
        == 3 * 2 * 4 * 8 * 16
    )


def test_conv_same_padding():
    x, w = jnp.zeros((2, 32, 32, 8)), jnp.zeros((3, 3, 8, 16))

    def f(a, b):
        return jax.lax.conv_general_dilated(
            a, b, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    assert count_flops(f, x, w) == 2 * 2 * 32 * 32 * 16 * 9 * 8


def test_grouped_conv():
    x, w = jnp.zeros((1, 16, 16, 8)), jnp.zeros((3, 3, 2, 8))

    def f(a, b):
        return jax.lax.conv_general_dilated(
            a, b, (1, 1), "SAME", feature_group_count=4,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    assert count_flops(f, x, w) == 2 * 16 * 16 * 8 * 9 * 2


def test_scan_multiplies_by_length():
    a, b = jnp.zeros((4, 4)), jnp.zeros((5, 4, 4))

    def f(x, ws):
        def body(c, w):
            return c @ w, ()

        out, _ = jax.lax.scan(body, x, ws)
        return out

    assert count_flops(f, a, b) == 5 * 2 * 4 * 4 * 4


def test_grad_counts_forward_and_backward():
    a, b = jnp.zeros((8, 8)), jnp.zeros((8, 8))
    fwd = count_flops(lambda x, y: jnp.sum(x @ y), a, b)
    tot = count_flops(
        lambda x, y: jax.grad(lambda u, v: jnp.sum(u @ v), argnums=(0, 1))(
            x, y
        )[0].sum(),
        a, b,
    )
    # fwd + two backward matmuls
    assert tot == pytest.approx(3 * fwd, rel=0.01)


def test_jit_boundary_counts_once():
    a, b = jnp.zeros((4, 8)), jnp.zeros((8, 16))
    g = jax.jit(lambda x, y: x @ y)
    assert count_flops(lambda x, y: g(x, y), a, b) == 2 * 4 * 8 * 16


def test_resnet50_matches_published_count():
    from equiadapt_tpu.models import ResNet50

    m = ResNet50(num_classes=1000, small_images=False)
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    params = jax.eval_shape(lambda k: m.init(k, x, training=False),
                            jax.random.key(0))
    # count on abstract params: make_jaxpr only needs avals
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params
    )
    f = count_flops(lambda p, xx: m.apply(p, xx, training=False), params, x)
    assert f == pytest.approx(resnet50_eval_flops(1), rel=0.02)
