"""Faithful SAM ViT image encoder (Segment-Anything image_encoder.py
semantics) in flax, for running converted pretrained SAM checkpoints.

Reference behavior contract (facebookresearch/segment-anything
modeling/image_encoder.py, wrapped by the reference at
examples/images/segmentation/model_utils.py:100-112):

* patch embed: Conv(embed, kernel=patch, stride=patch) + bias, NHWC here;
* learned 2-D absolute positional embedding (1, h, w, C);
* transformer blocks with pre-LN, fused qkv linear, scaled dot-product
  attention with *decomposed relative position biases*
  (attn += q . rel_pos_h + q . rel_pos_w), MLP(lin1 -> GELU -> lin2);
* windowed attention (window_size, with symmetric pad + unpad) in all
  blocks except `global_attn_indexes`;
* neck: Conv1x1(no bias) -> LayerNorm2d -> Conv3x3(no bias) -> LayerNorm2d.

Parameters are laid out 1:1 with the torch module tree so
`models/sam_convert.py` is a pure transpose/reshape mapping; equivalence of
a converted encoder against an independent numpy reimplementation of the
torch forward is asserted in tests/test_sam_convert.py.

This faithful encoder is the pretrained path; `ImageEncoderLite`
(models/segmentation.py) remains the lightweight from-scratch option.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray

__all__ = ["SamVitEncoder", "sam_vit_b_encoder_kwargs"]


def sam_vit_b_encoder_kwargs() -> dict:
    """Constructor kwargs matching the sam_vit_b checkpoint."""
    return dict(
        img_size=1024, patch_size=16, embed_dim=768, depth=12, num_heads=12,
        out_chans=256, window_size=14, global_attn_indexes=(2, 5, 8, 11),
    )


def _window_partition(x: Array, ws: int) -> Tuple[Array, Tuple[int, int]]:
    """(B, H, W, C) -> (B * nWin, ws, ws, C), padding bottom/right like
    torch F.pad(x, (0, 0, 0, pad_w, 0, pad_h))."""
    B, H, W, C = x.shape
    pad_h = (ws - H % ws) % ws
    pad_w = (ws - W % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
    return x, (Hp, Wp)


def _window_unpartition(
    win: Array, ws: int, pad_hw: Tuple[int, int], hw: Tuple[int, int]
) -> Array:
    Hp, Wp = pad_hw
    H, W = hw
    B = win.shape[0] // (Hp * Wp // ws // ws)
    x = win.reshape(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W, :]


def _rel_pos_table(q_size: int, k_size: int, rel_pos: Array) -> Array:
    """get_rel_pos: (2*max(q,k)-1, hd) table -> (q, k, hd) gathered biases.

    SAM interpolates when the table length mismatches; with equal q/k sizes
    (the only case its own checkpoints hit) the index math is
    coords[i, j] = i - j + (k_size - 1)."""
    max_rel = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel:
        # linear-resize the table like F.interpolate(..., mode="linear")
        import jax

        rel_pos = jax.image.resize(
            rel_pos, (max_rel, rel_pos.shape[1]), method="linear"
        )
    qi = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    ki = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    coords = (qi - ki + (k_size - 1) * max(q_size / k_size, 1.0)).astype(jnp.int32)
    return rel_pos[coords]


class SamAttention(nn.Module):
    """Multi-head attention with SAM's decomposed relative position biases.

    Operates on (B, H, W, C) token grids (already window-partitioned by the
    caller when windowed)."""

    dim: int
    num_heads: int
    use_rel_pos: bool = True
    input_size: Tuple[int, int] = (14, 14)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, H, W, C = x.shape
        nh = self.num_heads
        hd = C // nh
        qkv = nn.Dense(3 * C, name="qkv")(x.reshape(B, H * W, C))
        qkv = qkv.reshape(B, H * W, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, nh, HW, hd)
        attn = (q * hd**-0.5) @ k.transpose(0, 1, 3, 2)  # (B, nh, HW, HW)
        if self.use_rel_pos:
            rel_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * self.input_size[0] - 1, hd)
            )
            rel_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * self.input_size[1] - 1, hd)
            )
            Rh = _rel_pos_table(H, H, rel_h)  # (H, H, hd)
            Rw = _rel_pos_table(W, W, rel_w)  # (W, W, hd)
            r_q = q.reshape(B, nh, H, W, hd)
            bias_h = jnp.einsum("bnhwc,hkc->bnhwk", r_q, Rh)
            bias_w = jnp.einsum("bnhwc,wkc->bnhwk", r_q, Rw)
            attn = attn.reshape(B, nh, H, W, H, W)
            attn = attn + bias_h[..., :, None] + bias_w[..., None, :]
            attn = attn.reshape(B, nh, H * W, H * W)
        attn = nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, H * W, C)
        out = nn.Dense(C, name="proj")(out)
        return out.reshape(B, H, W, C)


class SamBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    window_size: int = 0  # 0 = global attention
    input_size: Tuple[int, int] = (64, 64)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        ws = self.window_size
        if ws > 0:
            hw = (x.shape[1], x.shape[2])
            x, pad_hw = _window_partition(x, ws)
            attn_size = (ws, ws)
        else:
            attn_size = self.input_size
        x = SamAttention(
            dim=self.dim, num_heads=self.num_heads, input_size=attn_size,
            name="attn",
        )(x)
        if ws > 0:
            x = _window_unpartition(x, ws, pad_hw, hw)
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="lin1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="lin2")(y)
        return x + y


class SamVitEncoder(nn.Module):
    """SAM ViT image encoder: (B, H, W, 3) -> (B, H/16, W/16, out_chans)."""

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Sequence[int] = (2, 5, 8, 11)
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID",
            name="patch_embed",
        )(x)
        B, h, w, C = x.shape
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, h, w, C)
        )
        x = x + pos
        for i in range(self.depth):
            ws = 0 if i in tuple(self.global_attn_indexes) else self.window_size
            x = SamBlock(
                dim=C, num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                window_size=ws, input_size=(h, w), name=f"block{i}",
            )(x)
        # neck: 1x1 conv -> LayerNorm2d -> 3x3 conv -> LayerNorm2d
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, name="neck_conv1")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="neck_ln1")(x)
        x = nn.Conv(
            self.out_chans, (3, 3), padding=1, use_bias=False, name="neck_conv2"
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, name="neck_ln2")(x)
        return x
