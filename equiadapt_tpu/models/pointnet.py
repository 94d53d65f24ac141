"""PointNet and DGCNN prediction networks, points-last-channel layout.

TPU-native rebuild of reference examples/pointcloud/common/networks.py:51-193
(+ Transform_Net :196 and DGCNN_partseg :~264). Points are (B, N, C)
(channels last) so every 1x1 "conv" is a Dense on the lane axis; the dynamic
kNN graph is one matmul + top_k per stage (MXU) and the neighbor gather is a
single take_along_axis.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from equiadapt_tpu.pointcloud.networks import knn_indices

Array = jnp.ndarray

__all__ = ["PointNet", "DGCNN", "TransformNet", "DGCNNPartSeg", "get_graph_feature"]


def get_graph_feature(
    x: Array, k: int, idx: Optional[Array] = None, knn_mode: str = "exact"
) -> Array:
    """DGCNN edge features: concat(neighbor - x, x) per kNN edge.

    Args:
        x: (B, N, C).
        knn_mode: "exact" | "approx" | "fused" (pointcloud.networks.knn_indices).

    Returns:
        (B, N, k, 2C)  (reference networks.py:19-48).
    """
    if idx is None:
        idx = knn_indices(x, k, mode=knn_mode)
    feat = jnp.take_along_axis(x[:, :, None], idx[..., None], axis=1)  # (B,N,k,C)
    center = jnp.broadcast_to(x[:, :, None], feat.shape)
    return jnp.concatenate([feat - center, center], axis=-1)


def _bn_act(x: Array, training: bool, slope: float = 0.0) -> Array:
    x = nn.BatchNorm(use_running_average=not training)(x)
    return nn.leaky_relu(x, negative_slope=slope) if slope else nn.relu(x)


class PointNet(nn.Module):
    """PointNet classifier (reference networks.py:51-79): five shared MLPs,
    global max pool, FC head."""

    num_classes: int = 40
    emb_dims: int = 1024

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        """x: (B, N, 3) -> (B, num_classes)."""
        for width in (64, 64, 64, 128, self.emb_dims):
            x = nn.Dense(width, use_bias=False)(x)
            x = _bn_act(x, training)
        x = jnp.max(x, axis=1)  # global max pool over points
        x = nn.Dense(512, use_bias=False)(x)
        x = _bn_act(x, training)
        x = nn.Dropout(0.5, deterministic=not training)(x)
        return nn.Dense(self.num_classes)(x)


class DGCNN(nn.Module):
    """Dynamic graph CNN classifier (reference networks.py:82-193)."""

    num_classes: int = 40
    k: int = 20
    emb_dims: int = 1024
    dropout: float = 0.5
    # kNN graph build per stage: "fused" routes through the pallas kernel
    # (ops/pallas/knn.py) — the per-stage (B, N, N) feature-space distance
    # matrices never touch HBM
    knn_mode: str = "exact"

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        """x: (B, N, 3) -> (B, num_classes)."""
        stages = []
        h = x
        for width in (64, 64, 128, 256):
            e = get_graph_feature(h, self.k, knn_mode=self.knn_mode)
            e = nn.Dense(width, use_bias=False)(e)
            e = _bn_act(e, training, slope=0.2)
            h = jnp.max(e, axis=2)  # max over neighbors
            stages.append(h)
        h = jnp.concatenate(stages, axis=-1)  # (B, N, 512)
        h = nn.Dense(self.emb_dims, use_bias=False)(h)
        h = _bn_act(h, training, slope=0.2)
        gmax = jnp.max(h, axis=1)
        gavg = jnp.mean(h, axis=1)
        g = jnp.concatenate([gmax, gavg], axis=-1)
        g = nn.Dense(512, use_bias=False)(g)
        g = _bn_act(g, training, slope=0.2)
        g = nn.Dropout(self.dropout, deterministic=not training)(g)
        g = nn.Dense(256)(g)
        g = _bn_act(g, training, slope=0.2)
        g = nn.Dropout(self.dropout, deterministic=not training)(g)
        return nn.Dense(self.num_classes)(g)


class TransformNet(nn.Module):
    """Input-alignment 3x3 transform regressor (reference networks.py:196+),
    initialized to the identity."""

    @nn.compact
    def __call__(self, edge_feat: Array, training: bool = False) -> Array:
        """edge_feat: (B, N, k, 6) -> (B, 3, 3)."""
        h = nn.Dense(64, use_bias=False)(edge_feat)
        h = _bn_act(h, training, slope=0.2)
        h = jnp.max(h, axis=2)
        h = nn.Dense(128, use_bias=False)(h)
        h = _bn_act(h, training, slope=0.2)
        h = nn.Dense(1024, use_bias=False)(h)
        h = _bn_act(h, training, slope=0.2)
        h = jnp.max(h, axis=1)
        h = nn.Dense(512, use_bias=False)(h)
        h = _bn_act(h, training, slope=0.2)
        h = nn.Dense(256, use_bias=False)(h)
        h = _bn_act(h, training, slope=0.2)
        t = nn.Dense(
            9, kernel_init=nn.initializers.zeros,
            bias_init=lambda *a: jnp.eye(3).reshape(9),
        )(h)
        return t.reshape(-1, 3, 3)


class DGCNNPartSeg(nn.Module):
    """DGCNN for ShapeNet part segmentation (reference networks.py:~264-401):
    per-point 50-part logits conditioned on a one-hot object class."""

    num_parts: int = 50
    num_categories: int = 16
    k: int = 20
    emb_dims: int = 1024
    dropout: float = 0.5
    knn_mode: str = "exact"  # see DGCNN.knn_mode

    @nn.compact
    def __call__(self, x: Array, category_onehot: Array, training: bool = False) -> Array:
        """x: (B, N, 3); category_onehot: (B, num_categories) -> (B, N, num_parts)."""
        B, N, _ = x.shape
        e0 = get_graph_feature(x, self.k, knn_mode=self.knn_mode)
        t = TransformNet()(e0, training=training)
        x = jnp.einsum("bnd,bde->bne", x, t)

        stages = []
        h = x
        for width in (64, 64, 64):
            e = get_graph_feature(h, self.k, knn_mode=self.knn_mode)
            e = nn.Dense(width, use_bias=False)(e)
            e = _bn_act(e, training, slope=0.2)
            if width != 64 or len(stages) in (0, 1):
                e = nn.Dense(width, use_bias=False)(e)
                e = _bn_act(e, training, slope=0.2)
            h = jnp.max(e, axis=2)
            stages.append(h)
        h = jnp.concatenate(stages, axis=-1)  # (B, N, 192)
        emb = nn.Dense(self.emb_dims, use_bias=False)(h)
        emb = _bn_act(emb, training, slope=0.2)
        g = jnp.max(emb, axis=1)  # (B, emb)

        lab = nn.Dense(64, use_bias=False)(category_onehot)
        lab = _bn_act(lab, training, slope=0.2)
        g = jnp.concatenate([g, lab], axis=-1)[:, None, :].repeat(N, axis=1)

        h = jnp.concatenate([g, h], axis=-1)
        h = nn.Dense(256, use_bias=False)(h)
        h = _bn_act(h, training, slope=0.2)
        h = nn.Dropout(self.dropout, deterministic=not training)(h)
        h = nn.Dense(256, use_bias=False)(h)
        h = _bn_act(h, training, slope=0.2)
        h = nn.Dropout(self.dropout, deterministic=not training)(h)
        h = nn.Dense(128, use_bias=False)(h)
        h = _bn_act(h, training, slope=0.2)
        return nn.Dense(self.num_parts)(h)
