"""VN-Small frame estimator and kNN graph features for point clouds.

TPU-native rebuild of reference equiadapt/pointcloud/
canonicalization_networks/equivariant_networks.py:15-150. The O(N^2) kNN is
one batched matmul + top_k on the MXU (SURVEY.md §5's prescription), and the
neighbor gather is a single take_along_axis — no index flattening.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from equiadapt_tpu.pointcloud.vector_neurons import (
    VNBatchNorm,
    VNLinearLeakyReLU,
    VNMaxPool,
    mean_pool,
)

Array = jnp.ndarray

__all__ = ["knn_indices", "graph_feature_cross", "VNSmall"]


def knn_indices(points: Array, k: int, mode: str = "exact") -> Array:
    """k nearest neighbors by negative squared distance.

    Args:
        points: (B, N, 3).
        mode: "exact" (jax.lax.top_k — reference semantics), "approx"
            (jax.lax.approx_max_k, the TPU-native partial-reduction top-k:
            ~2.9x faster at N=1024 with ~99% neighbor recall on Gaussian
            clouds — docs/benchmarking.md; fine for kNN graph building,
            off by default), or "fused" (pallas kernel, ops/pallas/knn.py:
            the (B, N, N) distance matrix never touches HBM; for
            coordinate kNN (D <= 4) indices are bit-identical to "exact"
            by construction — both paths use the same IEEE fp32
            elementwise distance algebra; for feature-space kNN (D > 4)
            differences are admissible only at fp32-level distance ties).

    Returns:
        (B, N, k) int32 neighbor indices (reference equivariant_networks.py:15-33:
        -||x_i - x_j||^2 top-k, self included).
    """
    if mode == "fused":
        from equiadapt_tpu.ops.pallas.knn import (
            knn_fused_supported,
            pallas_knn_indices,
        )

        if knn_fused_supported(points.shape, k):
            return pallas_knn_indices(
                points, k, interpret=jax.default_backend() != "tpu"
            )
        mode = "exact"  # unsupported shape: fall back
    D = points.shape[-1]
    if D <= 4:
        # Match the fused kernel's algebra for ALL input dtypes: the pallas
        # kernel casts to fp32 on load (ops/pallas/knn.py), so the exact path
        # must too — otherwise bf16 inputs would get bf16 elementwise
        # distances and the bit-identity invariant would silently break.
        points = points.astype(jnp.float32)
        # True-fp32 elementwise inner product for tiny D: IEEE mul/add in a
        # fixed order, the SAME algebra the fused pallas kernel uses on the
        # VPU (ops/pallas/knn.py _knn_kernel), so the two paths are
        # bit-identical by construction. Matmul formulations are not: TPU
        # DEFAULT decomposes fp32 into bf16 passes (~1e-2 distance error,
        # ~20% flipped 16-NN picks at N=1024), and even HIGHEST XLA einsum
        # vs HIGHEST Mosaic dot round differently at the last ulp, flipping
        # rare near-tie picks on hardware (bench round 3). XLA fuses the D
        # broadcast terms into one (B, N, N) loop, so traffic matches the
        # einsum it replaces.
        pt = jnp.swapaxes(points, 1, 2)  # (B, D, N)
        inner = points[:, :, 0, None] * pt[:, None, 0, :]
        for d in range(1, D):
            inner = inner + points[:, :, d, None] * pt[:, None, d, :]
        sq = points[..., 0] * points[..., 0]
        for d in range(1, D):
            sq = sq + points[..., d] * points[..., d]
    else:
        # feature-space kNN (DGCNN dynamic graphs, D >= 64): the MXU matmul
        # at HIGHEST precision — exact-enough distances (matches f64-ground-
        # truth picks on random features); fp32-tie-level differences vs the
        # fused kernel are admissible here (docstring above).
        inner = jnp.einsum(
            "bnd,bmd->bnm", points, points, precision=jax.lax.Precision.HIGHEST
        )
        sq = jnp.sum(points**2, axis=-1)
    neg_dist = 2 * inner - sq[:, :, None] - sq[:, None, :]
    if mode == "approx":
        _, idx = jax.lax.approx_max_k(neg_dist, k)
        return idx
    if jax.default_backend() == "tpu" and k <= 32:
        # iterative-max exact top-k: k rounds of (argmax + mask) are VPU
        # reductions instead of lax.top_k's sort network — 2.2x faster at
        # (64, 1024, 1024) k=16 on v5e, bit-identical indices incl.
        # first-occurrence tie order (docs/benchmarking.md round 3)
        cols = jax.lax.broadcasted_iota(jnp.int32, neg_dist.shape, neg_dist.ndim - 1)
        d = neg_dist
        idxs = []
        for _ in range(k):
            am = jnp.argmax(d, axis=-1)
            idxs.append(am)
            d = jnp.where(cols == am[..., None], -jnp.inf, d)
        return jnp.stack(idxs, axis=-1)
    _, idx = jax.lax.top_k(neg_dist, k)
    return idx


def graph_feature_cross(
    x: Array, k: int, idx: Optional[Array] = None, knn_mode: str = "exact"
) -> Array:
    """Cross-product edge features (reference equivariant_networks.py:36-76).

    Args:
        x: (B, N, 3, C) VN features (C vector channels per point).

    Returns:
        (B, N, k, 3, 3C): per edge, concat(neighbor - x, x, neighbor `cross` x)
        on the channel axis.
    """
    B, N, three, C = x.shape
    if idx is None:
        # kNN on the flattened vector coordinates, like the reference's
        # view(batch, -1, num_points)
        pts = x.reshape(B, N, three * C)
        idx = knn_indices(pts, k, mode=knn_mode)
    # gather neighbor features: (B, N, k, 3, C)
    feat = jnp.take_along_axis(
        x[:, :, None], idx[..., None, None], axis=1
    )
    center = jnp.broadcast_to(x[:, :, None], feat.shape)
    cross = jnp.cross(feat, center, axisa=-2, axisb=-2, axisc=-2)
    return jnp.concatenate([feat - center, center, cross], axis=-1)


class VNSmall(nn.Module):
    """Small VN frame estimator -> three equivariant 3-vectors per cloud.

    Reference equivariant_networks.py:79-150: conv_pos on kNN cross features,
    pool over neighbors, conv1 + bn1, conv2 (-> 4 channels), dropout, mean
    over points, first 3 channels as the (B, 3, 3) frame vectors.
    """

    n_knn: int = 20
    pooling: str = "mean"
    dropout_rate: float = 0.5
    # "approx" switches the kNN graph to jax.lax.approx_max_k (TPU-native,
    # ~2.9x faster frame estimation at ~99% neighbor recall); "exact"
    # keeps reference top_k semantics
    knn_mode: str = "exact"

    @nn.compact
    def __call__(self, point_cloud: Array, training: bool = False) -> Array:
        """point_cloud: (B, N, 3) -> (B, 3, 3) rows = equivariant vectors."""
        x = point_cloud[..., None]  # (B, N, 3, 1)
        feat = graph_feature_cross(
            x, k=self.n_knn, knn_mode=self.knn_mode
        )  # (B, N, k, 3, 3)
        out = VNLinearLeakyReLU(64 // 3, negative_slope=0.0, name="conv_pos")(
            feat, training=training
        )
        if self.pooling == "max":
            B, N, k, three, C = out.shape
            pooled = VNMaxPool(name="pool")(
                out.reshape(B * N, k, three, C)
            ).reshape(B, N, three, C)
        elif self.pooling == "mean":
            pooled = mean_pool(out, axis=2)
        else:
            raise ValueError(f"Pooling type {self.pooling} not supported")

        h = VNLinearLeakyReLU(64 // 3, negative_slope=0.0, name="conv1")(
            pooled, training=training
        )
        h = VNBatchNorm(name="bn1")(h, training=training)
        h = VNLinearLeakyReLU(12 // 3, negative_slope=0.0, name="conv2")(
            h, training=training
        )
        h = nn.Dropout(self.dropout_rate, deterministic=not training)(h)
        v = jnp.mean(h, axis=1)  # (B, 3, C=4)
        return jnp.moveaxis(v, -1, -2)[:, :3]  # (B, 3 vectors, 3)
