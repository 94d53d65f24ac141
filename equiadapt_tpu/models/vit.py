"""Vision Transformer (ViT-B/16 style) prediction network, NHWC.

Replaces the reference's torchvision vit_b_16 prediction network
(reference examples/images/classification/model_utils.py:35-60). Standard
architecture: conv patch embedding, learned position embeddings, CLS token,
pre-LN encoder blocks — bfloat16-friendly and MXU-dense.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray

__all__ = ["ViT", "ViTB16"]


class EncoderBlock(nn.Module):
    num_heads: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            dropout_rate=self.dropout, deterministic=not training,
        )(h, h)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype)(h)
        # exact (erf) GELU: torchvision's vit_b_16 MLPBlock uses nn.GELU
        # with the default erf form; keeping it exact makes converted
        # pretrained weights (models/convert.py) numerically faithful
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout, deterministic=not training)(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype)(h)
        return x + h


class ViT(nn.Module):
    """Vision Transformer classifier."""

    num_classes: int = 1000
    patch_size: int = 16
    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        B, H, W, _ = x.shape
        p = self.patch_size
        x = nn.Conv(
            self.hidden_dim, (p, p), strides=(p, p), padding="VALID", dtype=self.dtype
        )(x)
        x = x.reshape(B, -1, self.hidden_dim)
        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.hidden_dim)
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.hidden_dim)), x], axis=1)
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(stddev=0.02),
            (1, x.shape[1], self.hidden_dim),
        )
        x = x + pos
        x = nn.Dropout(self.dropout, deterministic=not training)(x)
        for _ in range(self.num_layers):
            x = EncoderBlock(
                num_heads=self.num_heads, mlp_dim=self.mlp_dim,
                dropout=self.dropout, dtype=self.dtype,
            )(x, training=training)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        return nn.Dense(self.num_classes, dtype=self.dtype)(x[:, 0])


def ViTB16(num_classes: int = 1000, **kw) -> ViT:
    return ViT(num_classes=num_classes, **kw)
