"""Non-equivariant canonicalization networks (vector-output backbones).

Rebuild of reference equiadapt/images/canonicalization_networks/
custom_nonequivariant_networks.py:8-230 in flax/NHWC. These feed the
"optimized" canonicalizers: they map an image to an `out_vector_size` vector
scored against a reference vector (discrete) or reshaped into 2D frame
vectors (optimized steerable).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from equiadapt_tpu.models.resnet import ResNet18, WideResNet50, WideResNet101

Array = jnp.ndarray

__all__ = ["ConvNetwork", "ResNet18Network", "WideResNet50Network", "WideResNet101Network"]


class ConvNetwork(nn.Module):
    """Strided conv stack with BN + GELU and an FC head.

    Layer pattern mirrors the reference (custom_nonequivariant_networks.py:
    38-55): first layer maps in->out stride 2; every (i % 3 == 2) layer
    doubles the width with padding 1; others keep width, stride 2, no pad.
    Head: BN -> dropout(0.5) -> ReLU -> Dense(out_vector_size).
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    num_layers: int = 2
    out_vector_size: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        width = self.out_channels
        k = self.kernel_size
        for i in range(self.num_layers):
            if i == 0:
                x = nn.Conv(width, (k, k), (2, 2), padding=0, dtype=self.dtype)(x)
            elif i % 3 == 2:
                width *= 2
                x = nn.Conv(width, (k, k), (2, 2), padding=1, dtype=self.dtype)(x)
            else:
                x = nn.Conv(width, (k, k), (2, 2), padding=0, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not training, dtype=self.dtype)(x)
            x = nn.gelu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.BatchNorm(use_running_average=not training, dtype=self.dtype)(x)
        x = nn.Dropout(0.5, deterministic=not training)(x)
        x = nn.relu(x)
        return nn.Dense(self.out_vector_size, dtype=self.dtype)(x)


class ResNet18Network(nn.Module):
    """ResNet-18 backbone with a replaced head -> out_vector_size
    (reference custom_nonequivariant_networks.py:83-130)."""

    out_vector_size: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        feats = ResNet18(num_classes=None, dtype=self.dtype)(x, training=training)
        return nn.Dense(self.out_vector_size, dtype=self.dtype)(feats)


class WideResNet50Network(nn.Module):
    """Wide-ResNet-50-2 backbone head (reference :133-180)."""

    out_vector_size: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        feats = WideResNet50(num_classes=None, dtype=self.dtype)(x, training=training)
        return nn.Dense(self.out_vector_size, dtype=self.dtype)(feats)


class WideResNet101Network(nn.Module):
    """Wide-ResNet-101-2 backbone head (reference :183-230)."""

    out_vector_size: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        feats = WideResNet101(num_classes=None, dtype=self.dtype)(x, training=training)
        return nn.Dense(self.out_vector_size, dtype=self.dtype)(feats)
