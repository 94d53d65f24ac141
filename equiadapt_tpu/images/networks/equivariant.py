"""Discrete-group equivariant energy networks for image canonicalization.

These produce the (B, |G|) group activations consumed by the discrete
canonicalizer. Two families, mirroring the reference's registry:

* `EquivariantNetwork` — the `e2cnn` network_type equivalent
  (reference ESCNNEquivariantNetwork, escnn_networks.py:8-117): lift conv ->
  [fiber BatchNorm -> ReLU -> Dropout -> group conv] x (L-2) -> group conv,
  then mean over (C, H, W) leaving the (B, |G|) fiber. Built from the
  from-scratch GCNN layers (group_conv.py) since e2cnn has no JAX analog;
  the fiber BatchNorm shares statistics across the group fiber per field,
  like e2cnn's InnerBatchNorm.
* `CustomEquivariantNetwork` — the `custom` network_type
  (reference custom_equivariant_networks.py:14-93): lift + (L-1) x
  [ReLU -> 1x1 group conv], mean over (C, H, W).
* `EquivariantWideResNet` — the `equivariant_wrn` network_type
  (reference ESCNNWRNEquivariantNetwork, escnn_networks.py:376-511):
  wide-resnet of group-conv residual blocks with fiber BN.

All NHWC with C-major/G-minor fiber layout.
"""

from __future__ import annotations


import flax.linen as nn
import jax.numpy as jnp

from equiadapt_tpu.images.networks.group_conv import (
    RotationEquivariantConv,
    RotationEquivariantConvLift,
    RotoReflectionEquivariantConv,
    RotoReflectionEquivariantConvLift,
)

Array = jnp.ndarray

__all__ = [
    "FiberBatchNorm",
    "EquivariantNetwork",
    "CustomEquivariantNetwork",
    "EquivariantWideResNet",
    "fiber_mean_activations",
]


def fiber_mean_activations(y: Array, num_group: int) -> Array:
    """(B, H, W, C*G) -> (B, G): mean over channels and space, keep fiber.

    Matches the reference's readout (escnn_networks.py:93-117: reshape to
    (B, C, G, H, W) then mean over (C, H, W)).
    """
    B, H, W, CG = y.shape
    return jnp.mean(y.reshape(B, H * W, CG // num_group, num_group), axis=(1, 2))


class FiberBatchNorm(nn.Module):
    """BatchNorm sharing statistics across the group fiber (per field).

    Equivalent to e2cnn InnerBatchNorm on regular fields: statistics are
    computed per base channel c over (batch, H, W, fiber), so the norm
    commutes with fiber permutations and preserves equivariance.
    """

    num_group: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        B, H, W, CG = x.shape
        G = self.num_group
        xr = x.reshape(B, H, W, CG // G, G)
        xr = jnp.swapaxes(xr, -1, -2)  # (B,H,W,G,C): fiber folded into batch axes
        xr = nn.BatchNorm(
            use_running_average=not training,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=x.dtype,  # follow the input (params stay fp32)
        )(xr)
        xr = jnp.swapaxes(xr, -1, -2)
        return xr.reshape(B, H, W, CG)


def _lift(group_type: str):
    return (
        RotationEquivariantConvLift
        if group_type == "rotation"
        else RotoReflectionEquivariantConvLift
    )


def _gconv(group_type: str):
    return (
        RotationEquivariantConv
        if group_type == "rotation"
        else RotoReflectionEquivariantConv
    )


class EquivariantNetwork(nn.Module):
    """GCNN energy network (the reference's ESCNN e2cnn network_type).

    Architecture per reference escnn_networks.py:69-90: L-1 conv blocks with
    BN/ReLU/Dropout plus a final group conv, all at the same width.
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    group_type: str = "rotation"
    num_rotations: int = 4
    num_layers: int = 2
    dropout_rate: float = 0.5
    # 2x2 average pool (stride 2) after the lift block. On even-size inputs
    # a 2x2/s2 avg pool commutes EXACTLY with rot90 (pooling windows map
    # bijectively onto pooling windows: (y, x) -> (x, S-1-y) sends window
    # (Y, X) to (X, S/2-1-Y)), so the C4-subgroup equivariance of the
    # energy is preserved bit-for-bit while the group convs run at 1/4 the
    # spatial cost — the serving-mode energy configuration (bench.py).
    # Default off: the reference's ESCNN stack has no downsampling
    # (escnn_networks.py:69-90).
    pool_after_lift: bool = False
    # Fold the 2x2/s2 average pool INTO the lift conv's filters
    # (group_conv._fold_avg_pool): the pooled lift runs as one stride-2 conv
    # and the full-resolution lift output (the energy path's dominant HBM
    # traffic — ~134 MB at 64px/batch 256) is never materialized. Pooling
    # then happens BEFORE BatchNorm/ReLU (pool_after_lift pools after), so
    # this is a distinct — equally rot90-exact — architecture, the round-3
    # serving preset.
    fused_pool_lift: bool = False

    @property
    def num_group(self) -> int:
        return self.num_rotations * (2 if self.group_type == "roto-reflection" else 1)

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        assert not (self.pool_after_lift and self.fused_pool_lift), (
            "pool_after_lift and fused_pool_lift are mutually exclusive"
        )
        G = self.num_group
        y = _lift(self.group_type)(
            in_channels=self.in_channels,
            out_channels=self.out_channels,
            kernel_size=self.kernel_size,
            num_rotations=self.num_rotations,
            fused_pool=self.fused_pool_lift,
        )(x)
        y = FiberBatchNorm(num_group=G)(y, training=training)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout_rate, deterministic=not training)(y)
        if self.pool_after_lift:
            y = nn.avg_pool(y, (2, 2), strides=(2, 2))
        for _ in range(self.num_layers - 2):
            y = _gconv(self.group_type)(
                in_channels=self.out_channels,
                out_channels=self.out_channels,
                kernel_size=self.kernel_size,
                num_rotations=self.num_rotations,
            )(y)
            y = FiberBatchNorm(num_group=G)(y, training=training)
            y = nn.relu(y)
            y = nn.Dropout(self.dropout_rate, deterministic=not training)(y)
        y = _gconv(self.group_type)(
            in_channels=self.out_channels,
            out_channels=self.out_channels,
            kernel_size=self.kernel_size,
            num_rotations=self.num_rotations,
        )(y)
        return fiber_mean_activations(y, G)


class CustomEquivariantNetwork(nn.Module):
    """Lift + 1x1 group convs (reference custom_equivariant_networks.py:14-93)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    group_type: str = "rotation"
    num_rotations: int = 4
    num_layers: int = 1

    @property
    def num_group(self) -> int:
        return self.num_rotations * (2 if self.group_type == "roto-reflection" else 1)

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        y = _lift(self.group_type)(
            in_channels=self.in_channels,
            out_channels=self.out_channels,
            kernel_size=self.kernel_size,
            num_rotations=self.num_rotations,
        )(x)
        for _ in range(self.num_layers - 1):
            y = nn.relu(y)
            y = _gconv(self.group_type)(
                in_channels=self.out_channels,
                out_channels=self.out_channels,
                kernel_size=1,
                num_rotations=self.num_rotations,
            )(y)
        return fiber_mean_activations(y, self.num_group)


class _WideBlock(nn.Module):
    """Residual group-conv block (reference ESCNNWideBasic, escnn_networks.py:228-298)."""

    channels: int
    kernel_size: int
    group_type: str
    num_rotations: int

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        G = self.num_rotations * (2 if self.group_type == "roto-reflection" else 1)
        pad = self.kernel_size // 2
        h = FiberBatchNorm(num_group=G)(x, training=training)
        h = nn.relu(h)
        h = _gconv(self.group_type)(
            in_channels=self.channels,
            out_channels=self.channels,
            kernel_size=self.kernel_size,
            num_rotations=self.num_rotations,
            padding=pad,
        )(h)
        h = FiberBatchNorm(num_group=G)(h, training=training)
        h = nn.relu(h)
        h = _gconv(self.group_type)(
            in_channels=self.channels,
            out_channels=self.channels,
            kernel_size=self.kernel_size,
            num_rotations=self.num_rotations,
            padding=pad,
        )(h)
        return x + h


class _WideBottleneck(nn.Module):
    """Bottleneck residual group-conv block (reference ESCNNWideBottleneck,
    escnn_networks.py:301-373): 1x1 squeeze -> kxk -> 1x1 expand."""

    channels: int
    kernel_size: int
    group_type: str
    num_rotations: int

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        G = self.num_rotations * (2 if self.group_type == "roto-reflection" else 1)
        pad = self.kernel_size // 2
        mid = max(self.channels // 2, 1)
        h = FiberBatchNorm(num_group=G)(x, training=training)
        h = nn.relu(h)
        h = _gconv(self.group_type)(
            in_channels=self.channels, out_channels=mid, kernel_size=1,
            num_rotations=self.num_rotations,
        )(h)
        h = FiberBatchNorm(num_group=G)(h, training=training)
        h = nn.relu(h)
        h = _gconv(self.group_type)(
            in_channels=mid, out_channels=mid, kernel_size=self.kernel_size,
            num_rotations=self.num_rotations, padding=pad,
        )(h)
        h = FiberBatchNorm(num_group=G)(h, training=training)
        h = nn.relu(h)
        h = _gconv(self.group_type)(
            in_channels=mid, out_channels=self.channels, kernel_size=1,
            num_rotations=self.num_rotations,
        )(h)
        return x + h


class EquivariantWideResNet(nn.Module):
    """Wide-resnet GCNN energy net (the `equivariant_wrn` network_type).

    Reference ESCNNWRNEquivariantNetwork (escnn_networks.py:376-511): lift,
    then residual wide blocks (basic or bottleneck), then a final group conv
    and fiber-mean readout.
    """

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    group_type: str = "rotation"
    num_rotations: int = 4
    num_blocks: int = 2
    block_type: str = "basic"  # basic | bottleneck

    @property
    def num_group(self) -> int:
        return self.num_rotations * (2 if self.group_type == "roto-reflection" else 1)

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        G = self.num_group
        y = _lift(self.group_type)(
            in_channels=self.in_channels,
            out_channels=self.out_channels,
            kernel_size=self.kernel_size,
            num_rotations=self.num_rotations,
            padding=self.kernel_size // 2,
        )(x)
        block = _WideBlock if self.block_type == "basic" else _WideBottleneck
        for _ in range(self.num_blocks):
            y = block(
                channels=self.out_channels,
                kernel_size=self.kernel_size,
                group_type=self.group_type,
                num_rotations=self.num_rotations,
            )(y, training=training)
        y = FiberBatchNorm(num_group=G)(y, training=training)
        y = nn.relu(y)
        y = _gconv(self.group_type)(
            in_channels=self.out_channels,
            out_channels=self.out_channels,
            kernel_size=1,
            num_rotations=self.num_rotations,
        )(y)
        return fiber_mean_activations(y, G)
