"""Point-cloud VN layer and canonicalization tests.

Anchor property: every VN layer commutes with a global rotation
x -> x @ Q (exact SO(3) equivariance, fp32 tolerance), and the
canonicalized cloud is rotation-invariant — the contract of
reference pointcloud/canonicalization/continuous_group.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equiadapt_tpu.common.lie import son_rep
from equiadapt_tpu.pointcloud import (
    EquivariantPointcloudCanonicalization,
    VNBatchNorm,
    VNLeakyReLU,
    VNLinear,
    VNLinearLeakyReLU,
    VNMaxPool,
    VNSmall,
    VNSoftplus,
    VNStdFeature,
    graph_feature_cross,
    knn_indices,
)

KEY = jax.random.key(0)


def _rot(seed=0, b=2):
    rng = np.random.default_rng(seed)
    params = jnp.asarray(rng.normal(size=(b, 3)).astype(np.float32))
    return son_rep(params, 3)  # (b, 3, 3)


def _feat(b=2, n=16, c=8, seed=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(b, n, 3, c)).astype(np.float32))


def _apply_rot(x, Q):
    """Rotate every 3-vector: x (B, ..., 3, C), Q (B, 3, 3): v -> Q^T v? No:
    rows as points convention -> v' = v @ Q means contraction on the vector
    axis."""
    return jnp.einsum("b...vc,bvw->b...wc", x, Q)


@pytest.mark.parametrize(
    "layer_ctor",
    [
        lambda: VNLinear(out_channels=5),
        lambda: VNLeakyReLU(),
        lambda: VNSoftplus(),
        lambda: VNLinearLeakyReLU(out_channels=6),
        lambda: VNBatchNorm(),
    ],
)
def test_vn_layers_equivariant(layer_ctor):
    layer = layer_ctor()
    x = _feat()
    params = layer.init(KEY, x)
    Q = _rot()
    y = layer.apply(params, x)
    y_rot = layer.apply(params, _apply_rot(x, Q))
    np.testing.assert_allclose(
        np.asarray(y_rot), np.asarray(_apply_rot(y, Q)), atol=1e-4
    )


def test_vn_maxpool_equivariant():
    pool = VNMaxPool()
    x = _feat()
    params = pool.init(KEY, x)
    Q = _rot()
    y = pool.apply(params, x)  # (B, 3, C)
    y_rot = pool.apply(params, _apply_rot(x, Q))
    np.testing.assert_allclose(
        np.asarray(y_rot), np.asarray(jnp.einsum("bvc,bvw->bwc", y, Q)), atol=1e-4
    )


def test_vn_std_feature_invariant_with_normalized_frame():
    std = VNStdFeature(normalize_frame=True)
    x = _feat(c=8)
    params = std.init(KEY, x)
    Q = _rot()
    y, _ = std.apply(params, x)
    y_rot, _ = std.apply(params, _apply_rot(x, Q))
    np.testing.assert_allclose(np.asarray(y_rot), np.asarray(y), atol=1e-3)


def test_knn_and_graph_features():
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.normal(size=(2, 32, 3)).astype(np.float32))
    idx = knn_indices(pts, 5)
    assert idx.shape == (2, 32, 5)
    # nearest neighbor of each point is itself
    np.testing.assert_array_equal(np.asarray(idx[..., 0]), np.arange(32)[None].repeat(2, 0))
    feat = graph_feature_cross(pts[..., None], k=5)
    assert feat.shape == (2, 32, 5, 3, 3)


def test_vnsmall_equivariance_and_canonicalization_invariance():
    net = VNSmall(n_knn=6, pooling="mean")
    rng = np.random.default_rng(4)
    pts = jnp.asarray(rng.normal(size=(2, 32, 3)).astype(np.float32))
    params = net.init(KEY, pts)
    Q = _rot(seed=9)
    v = net.apply(params, pts)  # (B, 3, 3)
    v_rot = net.apply(params, jnp.einsum("bnd,bdw->bnw", pts, Q))
    np.testing.assert_allclose(
        np.asarray(v_rot), np.asarray(jnp.einsum("bkd,bdw->bkw", v, Q)), atol=1e-3
    )

    canon = EquivariantPointcloudCanonicalization(canonicalization_network=net)
    cparams = canon.init(KEY, pts)
    x_c, info = canon.apply(cparams, pts)
    x_c_rot, _ = canon.apply(cparams, jnp.einsum("bnd,bdw->bnw", pts, Q))
    np.testing.assert_allclose(np.asarray(x_c_rot), np.asarray(x_c), atol=1e-3)
    # rotation is orthonormal
    R = np.asarray(info.element.rotation)
    np.testing.assert_allclose(
        R @ R.transpose(0, 2, 1), np.broadcast_to(np.eye(3), R.shape), atol=1e-5
    )
    # invert round-trips
    back = canon.invert_canonicalization(info, x_c)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_se3_translation_mode_invariance_and_roundtrip():
    """enable_translation=True: the canonical cloud is invariant to the
    SE(3) action x -> xQ + t (Q a proper rotation; reflections are out of
    scope — VNSmall's cross-product features are SO(3)-only), and invert
    round-trips points (+t) vs directions (rotate-only)."""
    net = VNSmall(n_knn=6, pooling="mean")
    rng = np.random.default_rng(11)
    pts = jnp.asarray(rng.normal(size=(2, 32, 3)).astype(np.float32))
    canon = EquivariantPointcloudCanonicalization(
        canonicalization_network=net, enable_translation=True
    )
    cparams = canon.init(KEY, pts)
    Q = _rot(seed=13)
    t = jnp.asarray(rng.normal(size=(2, 1, 3)).astype(np.float32) * 5.0)
    x_c, info = canon.apply(cparams, pts)
    x_c_moved, info_moved = canon.apply(
        cparams, jnp.einsum("bnd,bdw->bnw", pts, Q) + t
    )
    np.testing.assert_allclose(np.asarray(x_c_moved), np.asarray(x_c), atol=1e-3)
    # canonical form is centered
    np.testing.assert_allclose(
        np.asarray(jnp.mean(x_c, axis=1)), np.zeros((2, 3)), atol=1e-5
    )
    # the element tracks the acting translation: t' = t_orig Q + t
    np.testing.assert_allclose(
        np.asarray(info_moved.element.translation),
        np.asarray(jnp.einsum("bd,bdw->bw", info.element.translation, Q) + t[:, 0]),
        atol=1e-3,
    )
    # point-valued invert round-trips; direction-valued invert rotates only
    back = canon.invert_canonicalization(info, x_c)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)
    dirs = canon.invert_canonicalization(info, x_c, points=False)
    np.testing.assert_allclose(
        np.asarray(dirs),
        np.asarray(jnp.einsum("bnk,bkd->bnd", x_c, info.element.rotation)),
        atol=1e-6,
    )


@pytest.mark.slow
def test_vnsmall_maxpool_variant_runs():
    net = VNSmall(n_knn=4, pooling="max")
    rng = np.random.default_rng(5)
    pts = jnp.asarray(rng.normal(size=(2, 16, 3)).astype(np.float32))
    params = net.init(KEY, pts)
    v = net.apply(params, pts)
    assert v.shape == (2, 3, 3)
    assert np.isfinite(np.asarray(v)).all()


def test_vnsmall_approx_knn_mode_runs_and_matches_closely():
    """knn_mode='approx' (TPU approx_max_k fast path): same architecture,
    near-identical frames on CPU where approx_max_k falls back to exact."""
    import numpy as np

    from equiadapt_tpu.pointcloud.networks import VNSmall, knn_indices

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
    idx_e = knn_indices(pts, 8, mode="exact")
    idx_a = knn_indices(pts, 8, mode="approx")
    # same neighbor sets (ordering may differ)
    same = np.mean([
        len(set(np.asarray(idx_e[b, n])) & set(np.asarray(idx_a[b, n]))) / 8
        for b in range(2) for n in range(0, 128, 16)
    ])
    assert same > 0.95

    net = VNSmall(n_knn=8, pooling="mean", knn_mode="approx")
    params = net.init(jax.random.key(0), pts, training=False)
    vecs = net.apply(params, pts, training=False)
    assert vecs.shape == (2, 3, 3)
    assert bool(jnp.isfinite(vecs).all())


def test_knn_iterative_exact_matches_top_k():
    """The TPU iterative-max exact top-k (knn_indices fast path) is
    bit-identical to lax.top_k, including self-neighbor-first ordering.
    The TPU gate isn't active on CPU, so the equivalent computation is
    checked inline against the library's exact mode."""
    import jax.numpy as jnp
    from jax import lax

    from equiadapt_tpu.pointcloud.networks import knn_indices

    pts = jax.random.normal(jax.random.key(11), (4, 128, 3))
    ref = knn_indices(pts, 8, mode="exact")  # lax.top_k on CPU
    inner = jnp.einsum("bnd,bmd->bnm", pts, pts)
    sq = jnp.sum(pts**2, axis=-1)
    d = 2 * inner - sq[:, :, None] - sq[:, None, :]
    cols = lax.broadcasted_iota(jnp.int32, d.shape, d.ndim - 1)
    idxs = []
    for _ in range(8):
        am = jnp.argmax(d, axis=-1)
        idxs.append(am)
        d = jnp.where(cols == am[..., None], -jnp.inf, d)
    iterative = jnp.stack(idxs, axis=-1)
    np.testing.assert_array_equal(np.asarray(iterative), np.asarray(ref))
    # every point is its own nearest neighbor
    np.testing.assert_array_equal(
        np.asarray(ref[..., 0]), np.arange(128)[None].repeat(4, 0)
    )


def test_knn_fused_kernel_matches_exact():
    """The fused pallas kNN (interpret mode on CPU) emits the same indices
    as the exact XLA path on random clouds, including self-first order."""
    from equiadapt_tpu.pointcloud.networks import VNSmall, knn_indices

    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.normal(size=(2, 256, 3)).astype(np.float32))
    ref = knn_indices(pts, 8, mode="exact")
    fused = knn_indices(pts, 8, mode="fused")
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))
    # self-neighbor first
    np.testing.assert_array_equal(
        np.asarray(fused[..., 0]), np.arange(256)[None, :].repeat(2, 0)
    )

    # feature-space distances (DGCNN-style wide D) go through the same kernel
    feat = jnp.asarray(rng.normal(size=(2, 256, 32)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(knn_indices(feat, 4, mode="fused")),
        np.asarray(knn_indices(feat, 4, mode="exact")),
    )

    # non-power-of-two N picks a whole-divisor query tile (mq=100 here)
    odd = jnp.asarray(rng.normal(size=(2, 100, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(knn_indices(odd, 4, mode="fused")),
        np.asarray(knn_indices(odd, 4, mode="exact")),
    )

    # unsupported shape (tiny N < minimum tile) falls back to exact
    tiny = jnp.asarray(rng.normal(size=(2, 6, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(knn_indices(tiny, 4, mode="fused")),
        np.asarray(knn_indices(tiny, 4, mode="exact")),
    )

    # end-to-end through VNSmall
    net = VNSmall(n_knn=8, pooling="mean", knn_mode="fused")
    params = net.init(jax.random.key(0), pts, training=False)
    vecs = net.apply(params, pts, training=False)
    net_e = VNSmall(n_knn=8, pooling="mean", knn_mode="exact")
    vecs_e = net_e.apply(params, pts, training=False)
    np.testing.assert_allclose(
        np.asarray(vecs), np.asarray(vecs_e), rtol=1e-5, atol=1e-6
    )
