"""ResNet family (ResNet-18/50, Wide-ResNet-50/101) in flax, NHWC.

Serves two roles, mirroring the reference:
* prediction networks (reference examples/images/classification/
  model_utils.py:35-82 uses torchvision resnet50, with CIFAR stem surgery:
  3x3 conv1, no maxpool, model_utils.py:61-65);
* non-equivariant canonicalization backbones with a replaced head
  (reference equiadapt/images/canonicalization_networks/
  custom_nonequivariant_networks.py:83-230).

torchvision-compatible architecture (BasicBlock / Bottleneck, stride-2
downsampling convs, BN + ReLU), but TPU-idiomatic: NHWC, fused
conv+BN+ReLU left to XLA, bfloat16-friendly.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray

__all__ = ["ResNet", "ResNet18", "ResNet50", "WideResNet50", "WideResNet101"]


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        norm = partial(nn.BatchNorm, use_running_average=not training, dtype=self.dtype)
        residual = x
        y = nn.Conv(self.filters, (3, 3), (self.stride, self.stride), padding=1,
                    use_bias=False, dtype=self.dtype)(x)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(y)
        y = norm()(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1), (self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(x)
            residual = norm()(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int  # bottleneck width; output channels = 4 * filters
    stride: int = 1
    width_mult: int = 1  # 2 for wide variants
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        norm = partial(nn.BatchNorm, use_running_average=not training, dtype=self.dtype)
        width = self.filters * self.width_mult
        out_ch = self.filters * 4
        residual = x
        y = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(width, (3, 3), (self.stride, self.stride), padding=1,
                    use_bias=False, dtype=self.dtype)(y)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = norm()(y)
        if residual.shape != y.shape:
            residual = nn.Conv(out_ch, (1, 1), (self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(x)
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """torchvision-layout ResNet.

    Args:
        stage_sizes: blocks per stage.
        block: BasicBlock or Bottleneck (partial with width_mult for wide).
        num_classes: head size (None -> return pooled features).
        small_images: CIFAR-style stem (3x3 conv, no maxpool), the surgery
            applied by the reference for CIFAR/MNIST
            (classification/model_utils.py:61-65).
    """

    stage_sizes: Sequence[int]
    block: Callable[..., nn.Module]
    num_classes: int | None = 1000
    small_images: bool = False
    # return the per-stage feature maps (C2..C5 in FPN terms) instead of
    # pooled features/logits — the detection-backbone mode (torchvision's
    # IntermediateLayerGetter analog). Parameter naming is unchanged, so
    # converted pretrained weights (models/convert.py) load either way.
    return_stages: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        norm = partial(nn.BatchNorm, use_running_average=not training, dtype=self.dtype)
        if self.small_images:
            x = nn.Conv(64, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(x)
        else:
            x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False, dtype=self.dtype)(x)
        x = norm()(x)
        x = nn.relu(x)
        if not self.small_images:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        filters = 64
        stages = []
        for i, n_blocks in enumerate(self.stage_sizes):
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                x = self.block(filters=filters, stride=stride, dtype=self.dtype)(
                    x, training=training
                )
            stages.append(x)
            filters *= 2
        if self.return_stages:
            return tuple(stages)
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes is not None:
            x = nn.Dense(self.num_classes, dtype=self.dtype)(x)
        return x


ResNet18 = partial(ResNet, stage_sizes=[2, 2, 2, 2], block=BasicBlock)
ResNet50 = partial(ResNet, stage_sizes=[3, 4, 6, 3], block=Bottleneck)
WideResNet50 = partial(
    ResNet, stage_sizes=[3, 4, 6, 3], block=partial(Bottleneck, width_mult=2)
)
WideResNet101 = partial(
    ResNet, stage_sizes=[3, 4, 23, 3], block=partial(Bottleneck, width_mult=2)
)
