"""Vector-neuron (VN) layers — SO(3)-equivariant point features.

TPU-native rebuild of reference equiadapt/pointcloud/
canonicalization_networks/vector_neuron_layers.py:16-492 (which credits
FlyingGiraffe/vnn). Every op is an einsum/elementwise composite the XLA
fuser handles well.

Layout change (deliberate): the reference uses (B, C, 3, N[, K]) — channels
second. Here features are **channels-last**: (B, N[, K], 3, C), so the
channel contraction of every VN linear is a plain `x @ W` on the minor axis
(MXU lanes) and the 3-axis sits in sublanes. All dot products over the
vector axis are cheap sublane reductions.

A VN feature with C channels is a set of C 3-vectors per point; every layer
commutes with a global right-rotation x -> x @ Q, which the tests assert
exactly (orthogonal Q, fp32 tolerance).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray

EPS = 1e-6

__all__ = [
    "VNLinear",
    "VNBilinear",
    "VNSoftplus",
    "VNLeakyReLU",
    "VNLinearLeakyReLU",
    "VNBatchNorm",
    "VNMaxPool",
    "mean_pool",
    "VNStdFeature",
]


def _channel_linear(x: Array, features: int, name: str, module: nn.Module) -> Array:
    """Linear map over the channel (last) axis, no bias (VN requirement)."""
    return nn.Dense(features, use_bias=False, name=name)(x)


class VNLinear(nn.Module):
    """Channel-mixing linear map (reference vector_neuron_layers.py:16-49)."""

    out_channels: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Dense(self.out_channels, use_bias=False, name="map_to_feat")(x)


class VNBilinear(nn.Module):
    """Bilinear (features x labels) map (reference :52-90)."""

    out_channels: int

    @nn.compact
    def __call__(self, x: Array, labels: Array) -> Array:
        # x: (..., 3, C1), labels: (..., C2) broadcast over the vector axis
        w = self.param(
            "bilinear",
            nn.initializers.lecun_normal(),
            (x.shape[-1], labels.shape[-1], self.out_channels),
        )
        return jnp.einsum("...vc,...d,cde->...ve", x, labels, w)


def _leaky_project(p: Array, d: Array, negative_slope: float) -> Array:
    """Shared VN-ReLU geometry: keep p where <p,d> >= 0, else project out the
    d-component (reference :200-207)."""
    dot = jnp.sum(p * d, axis=-2, keepdims=True)
    mask = (dot >= 0).astype(p.dtype)
    d_norm_sq = jnp.sum(d * d, axis=-2, keepdims=True)
    proj = p - (dot / (d_norm_sq + EPS)) * d
    return negative_slope * p + (1 - negative_slope) * (mask * p + (1 - mask) * proj)


class VNLeakyReLU(nn.Module):
    """Direction-gated leaky ReLU (reference :154-207)."""

    share_nonlinearity: bool = False
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d_ch = 1 if self.share_nonlinearity else x.shape[-1]
        d = nn.Dense(d_ch, use_bias=False, name="map_to_dir")(x)
        return _leaky_project(x, d, self.negative_slope)


class VNSoftplus(nn.Module):
    """Angle-based soft nonlinearity (reference :93-151)."""

    share_nonlinearity: bool = False
    negative_slope: float = 0.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d_ch = 1 if self.share_nonlinearity else x.shape[-1]
        d = nn.Dense(d_ch, use_bias=False, name="map_to_dir")(x)
        dot = jnp.sum(x * d, axis=-2, keepdims=True)
        xn = jnp.linalg.norm(x, axis=-2, keepdims=True)
        dn = jnp.linalg.norm(d, axis=-2, keepdims=True)
        angle = jnp.arccos(jnp.clip(dot / (xn * dn + EPS), -1.0, 1.0))
        mask = jnp.cos(angle / 2.0) ** 2
        d_norm_sq = jnp.sum(d * d, axis=-2, keepdims=True)
        proj = x - (dot / (d_norm_sq + EPS)) * d
        return self.negative_slope * x + (1 - self.negative_slope) * (
            mask * x + (1 - mask) * proj
        )


class VNBatchNorm(nn.Module):
    """Normalize per-channel vector norms with BatchNorm statistics
    (reference :276-324): directions preserved, norms batch-normalized."""

    momentum: float = 0.9  # torch BatchNorm default momentum 0.1 == 0.9 decay

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        norm = jnp.linalg.norm(x, axis=-2) + EPS  # (..., C)
        norm_bn = nn.BatchNorm(
            use_running_average=not training, momentum=self.momentum
        )(norm)
        return x / norm[..., None, :] * norm_bn[..., None, :]


class VNLinearLeakyReLU(nn.Module):
    """Fused linear + VN BatchNorm + direction-gated leaky ReLU
    (reference :210-273). One matmul pair; the rest is VPU elementwise."""

    out_channels: int
    share_nonlinearity: bool = False
    negative_slope: float = 0.2
    use_batchnorm: bool = True

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        p = nn.Dense(self.out_channels, use_bias=False, name="map_to_feat")(x)
        if self.use_batchnorm:
            p = VNBatchNorm(name="batchnorm")(p, training=training)
        d_ch = 1 if self.share_nonlinearity else self.out_channels
        d = nn.Dense(d_ch, use_bias=False, name="map_to_dir")(x)
        return _leaky_project(p, d, self.negative_slope)


class VNMaxPool(nn.Module):
    """Max pool over the points axis by direction-projected score
    (reference :327-364).

    x: (B, N, 3, C) -> (B, 3, C): per channel, take the point whose feature
    has the largest <x, d>.
    """

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = nn.Dense(x.shape[-1], use_bias=False, name="map_to_dir")(x)
        dot = jnp.sum(x * d, axis=-2)  # (B, N, C)
        idx = jnp.argmax(dot, axis=-2)  # (B, C) best point per channel
        # gather: out[b, :, c] = x[b, idx[b, c], :, c]
        return jnp.take_along_axis(x, idx[:, None, None, :], axis=1)[:, 0]


def mean_pool(x: Array, axis: int = 1, keepdims: bool = False) -> Array:
    """Mean over the points axis (reference :367-380)."""
    return jnp.mean(x, axis=axis, keepdims=keepdims)


class VNStdFeature(nn.Module):
    """Invariant standardization via a learned frame (reference :383-492).

    Returns (x_std, frame): x_std = x @ frame-ish contraction, invariant when
    normalize_frame is used with orthonormalization.
    """

    dim: int = 4
    normalize_frame: bool = False
    share_nonlinearity: bool = False
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Tuple[Array, Array]:
        C = x.shape[-1]
        z = VNLinearLeakyReLU(
            C // 2,
            share_nonlinearity=self.share_nonlinearity,
            negative_slope=self.negative_slope,
            name="vn1",
        )(x, training=training)
        z = VNLinearLeakyReLU(
            C // 4,
            share_nonlinearity=self.share_nonlinearity,
            negative_slope=self.negative_slope,
            name="vn2",
        )(z, training=training)
        out_ch = 2 if self.normalize_frame else 3
        z = nn.Dense(out_ch, use_bias=False, name="vn_lin")(z)  # (..., 3, out_ch)
        # frame vectors live on the channel axis: z0[..., k] is a 3-vector
        z0 = jnp.moveaxis(z, -1, -2)  # (..., out_ch, 3)
        if self.normalize_frame:
            v1 = z0[..., 0, :]
            u1 = v1 / (jnp.linalg.norm(v1, axis=-1, keepdims=True) + EPS)
            v2 = z0[..., 1, :]
            v2 = v2 - jnp.sum(v2 * u1, axis=-1, keepdims=True) * u1
            u2 = v2 / (jnp.linalg.norm(v2, axis=-1, keepdims=True) + EPS)
            u3 = jnp.cross(u1, u2)
            frame = jnp.stack([u1, u2, u3], axis=-2)  # (..., 3, 3)
        else:
            frame = z0  # (..., 3, 3)
        # x: (..., 3, C); contract the vector axis with the frame rows
        x_std = jnp.einsum("...vc,...kv->...kc", x, frame)
        return x_std, frame
