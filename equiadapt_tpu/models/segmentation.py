"""Promptable instance segmentation: SAM-style model + losses, NHWC.

TPU-native counterpart of reference examples/images/segmentation/
model_utils.py:14-289 (SAMModel wrapper, FocalLoss :165-191, DiceLoss
:194-213, calc_iou :281-289). The reference wraps facebookresearch's
pretrained SAM and loops Python-side over images/prompts
(model_utils.py:126-160); here `SAMLite` is a from-scratch promptable
architecture with the same interface shape — ViT image encoder, box prompt
encoder, two-way mask decoder — fully batched over (B, N) prompts so the
whole forward is one XLA program. `convert_sam_weights` maps a torch SAM
checkpoint onto the encoder/decoder parameter tree for users with local
checkpoints (this environment has no network egress to fetch one).

Uniform output contract (matches the reference 4-tuple semantics):
    pred_masks: (B, N, H, W) logits; ious: (B, N); outputs dict with
    thresholded masks / scores / labels / boxes.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from equiadapt_tpu.models.vit import EncoderBlock

Array = jnp.ndarray

ALPHA = 0.8
GAMMA = 2.0

__all__ = [
    "focal_loss",
    "dice_loss",
    "calc_iou",
    "SAMLite",
    "segmentation_forward_outputs",
]


def focal_loss(logits: Array, targets: Array, alpha: float = ALPHA, gamma: float = GAMMA) -> Array:
    """Reference FocalLoss (model_utils.py:165-191): BCE on flattened
    sigmoid probabilities, focal-modulated at the *batch* level (their
    exact, slightly unusual formulation: BCE is reduced first)."""
    p = jax.nn.sigmoid(logits).reshape(-1)
    t = targets.reshape(-1)
    eps = 1e-7
    bce = -jnp.mean(t * jnp.log(p + eps) + (1 - t) * jnp.log(1 - p + eps))
    bce_exp = jnp.exp(-bce)
    return alpha * (1 - bce_exp) ** gamma * bce


def dice_loss(logits: Array, targets: Array, smooth: float = 1.0) -> Array:
    """Reference DiceLoss (model_utils.py:194-213)."""
    p = jax.nn.sigmoid(logits).reshape(-1)
    t = targets.reshape(-1)
    inter = jnp.sum(p * t)
    dice = (2.0 * inter + smooth) / (jnp.sum(p) + jnp.sum(t) + smooth)
    return 1.0 - dice


def calc_iou(pred_mask: Array, gt_mask: Array, eps: float = 1e-7) -> Array:
    """Per-mask IoU of thresholded predictions (model_utils.py:281-289).

    pred_mask: (..., H, W) logits; gt_mask: (..., H, W) {0,1}.
    """
    pred = (pred_mask > 0).astype(jnp.float32)
    inter = jnp.sum(pred * gt_mask, axis=(-2, -1))
    union = jnp.sum(pred, axis=(-2, -1)) + jnp.sum(gt_mask, axis=(-2, -1)) - inter
    return inter / (union + eps)


class ImageEncoderLite(nn.Module):
    """ViT image encoder + neck -> (B, h, w, embed) feature grid."""

    embed_dim: int = 256
    patch_size: int = 16
    depth: int = 4
    num_heads: int = 4
    width: int = 256

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        B, H, W, _ = x.shape
        p = self.patch_size
        h, w = H // p, W // p
        t = nn.Conv(self.width, (p, p), strides=(p, p), padding="VALID")(x)
        t = t.reshape(B, h * w, self.width)
        pos = self.param(
            "pos_embedding", nn.initializers.normal(0.02), (1, h * w, self.width)
        )
        t = t + pos
        for _ in range(self.depth):
            t = EncoderBlock(num_heads=self.num_heads, mlp_dim=self.width * 4)(
                t, training=training
            )
        t = nn.LayerNorm()(t)
        t = t.reshape(B, h, w, self.width)
        # SAM-style neck: 1x1 -> 3x3 conv to the prompt/decoder embed dim
        t = nn.Conv(self.embed_dim, (1, 1), use_bias=False)(t)
        t = nn.LayerNorm()(t)
        t = nn.Conv(self.embed_dim, (3, 3), padding=1, use_bias=False)(t)
        t = nn.LayerNorm()(t)
        return t


class PromptEncoderLite(nn.Module):
    """Box prompts -> sparse embeddings (2 corner tokens per box).

    Random-Fourier positional encoding of normalized corner coordinates plus
    learned corner-type embeddings (SAM's scheme, batched over (B, N))."""

    embed_dim: int = 256

    @nn.compact
    def __call__(self, boxes: Array, image_hw: Tuple[int, int]) -> Array:
        """boxes: (B, N, 4) xyxy pixels -> (B, N, 2, embed_dim)."""
        H, W = image_hw
        pe = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, self.embed_dim // 2)
        )
        corner_type = self.param(
            "corner_embed", nn.initializers.normal(0.02), (2, self.embed_dim)
        )
        corners = jnp.stack(
            [boxes[..., :2], boxes[..., 2:]], axis=-2
        )  # (B, N, 2, 2) xy
        norm = corners / jnp.asarray([W, H], corners.dtype)
        proj = (2.0 * norm - 1.0) @ pe  # (B, N, 2, embed/2)
        enc = jnp.concatenate([jnp.sin(2 * jnp.pi * proj), jnp.cos(2 * jnp.pi * proj)], -1)
        return enc + corner_type


class MaskDecoderLite(nn.Module):
    """Two-way-attention mask decoder: mask + IoU tokens attend to prompts
    and the image grid, then a hypernetwork head produces per-prompt masks."""

    embed_dim: int = 256
    depth: int = 2
    num_heads: int = 4
    num_mask_tokens: int = 1  # 4 = SAM multimask (3 + 1 default) heads

    @nn.compact
    def __call__(
        self, image_embed: Array, prompt_embed: Array, training: bool = False
    ) -> Tuple[Array, Array]:
        """image_embed: (B, h, w, C); prompt_embed: (B, N, 2, C).

        Returns mask logits (B, N, 4h, 4w) and predicted IoU (B, N).
        """
        B, h, w, C = image_embed.shape
        N = prompt_embed.shape[1]
        T = self.num_mask_tokens
        img = image_embed.reshape(B, 1, h * w, C)
        img = jnp.broadcast_to(img, (B, N, h * w, C)).reshape(B * N, h * w, C)

        # token layout follows SAM: [iou_token, mask_tokens..., prompts]
        # (mask_decoder.iou_token / mask_tokens in the torch checkpoint)
        mask_tok = self.param(
            "mask_tokens", nn.initializers.normal(0.02), (T, C)
        )
        iou_tok = self.param("iou_token", nn.initializers.normal(0.02), (1, C))
        toks = jnp.concatenate(
            [
                jnp.broadcast_to(iou_tok[None], (B * N, 1, C)),
                jnp.broadcast_to(mask_tok[None], (B * N, T, C)),
                prompt_embed.reshape(B * N, 2, C),
            ],
            axis=1,
        )  # (B*N, 1+T+2, C)

        for _ in range(self.depth):
            # tokens self-attend
            a = nn.MultiHeadDotProductAttention(num_heads=self.num_heads)(toks, toks)
            toks = nn.LayerNorm()(toks + a)
            # tokens -> image cross attention
            a = nn.MultiHeadDotProductAttention(num_heads=self.num_heads)(toks, img)
            toks = nn.LayerNorm()(toks + a)
            mlp = nn.Dense(C * 2)(toks)
            mlp = nn.gelu(mlp)
            toks = nn.LayerNorm()(toks + nn.Dense(C)(mlp))
            # image -> tokens cross attention (the "two-way" part)
            a = nn.MultiHeadDotProductAttention(num_heads=self.num_heads)(img, toks)
            img = nn.LayerNorm()(img + a)

        grid = img.reshape(B * N, h, w, C)
        # SAM output_upscaling: convT 2x2/2 -> LayerNorm2d -> GELU -> convT -> GELU
        up = nn.ConvTranspose(C // 4, (2, 2), strides=(2, 2), name="upscale_conv1")(grid)
        up = nn.LayerNorm(epsilon=1e-6, name="upscale_ln")(up)
        up = nn.gelu(up)
        up = nn.ConvTranspose(C // 8, (2, 2), strides=(2, 2), name="upscale_conv2")(up)
        up = nn.gelu(up)  # (B*N, 4h, 4w, C//8)

        # per-mask-token hypernetwork MLPs + iou head (SAM's
        # output_hypernetworks_mlps / iou_prediction_head, 3 layers each)
        def mlp3(t, dims, name):
            for li, d in enumerate(dims):
                t = nn.Dense(d, name=f"{name}_{li}")(t)
                if li < len(dims) - 1:
                    t = nn.relu(t)
            return t

        mask_out = toks[:, 1:1 + T]  # (B*N, T, C)
        hypers = jnp.stack(
            [
                mlp3(mask_out[:, j], (C, C, C // 8), f"hyper{j}")
                for j in range(T)
            ],
            axis=1,
        )  # (B*N, T, C//8)
        masks = jnp.einsum("bhwc,btc->bthw", up, hypers)  # (B*N, T, 4h, 4w)
        iou = mlp3(toks[:, 0], (C, C, T), "iou_head")  # (B*N, T)

        if T > 1:
            # SAM multimask behavior: return the best mask by predicted IoU
            best = jnp.argmax(iou, axis=-1)
            oh = jax.nn.one_hot(best, T, dtype=masks.dtype)
            masks = jnp.einsum("bthw,bt->bhw", masks, oh)
            iou_sel = jnp.sum(iou * oh, axis=-1)
        else:
            masks = masks[:, 0]
            iou_sel = iou[:, 0]
        return (
            masks.reshape(B, N, 4 * h, 4 * w),
            iou_sel.reshape(B, N),
        )


class SAMLite(nn.Module):
    """Promptable segmentation model with the reference SAMModel interface
    shape (model_utils.py:113-162), batched over prompts."""

    embed_dim: int = 256
    encoder_depth: int = 4
    decoder_depth: int = 2
    num_heads: int = 4
    patch_size: int = 16
    # "lite": from-scratch light ViT; "sam_vit": the faithful SAM encoder
    # (models/sam_encoder.py) for running converted pretrained checkpoints
    encoder: str = "lite"
    num_mask_tokens: int = 1  # 4 for SAM multimask checkpoints

    @nn.compact
    def __call__(
        self, images: Array, boxes: Array, training: bool = False
    ) -> Tuple[Array, Array]:
        """images: (B, H, W, 3); boxes: (B, N, 4) xyxy.

        Returns (pred_mask_logits (B, N, H, W), iou_predictions (B, N)).
        """
        B, H, W, _ = images.shape
        if self.encoder == "sam_vit":
            from equiadapt_tpu.models.sam_encoder import SamVitEncoder

            emb = SamVitEncoder(
                img_size=H, patch_size=self.patch_size,
                embed_dim=self.encoder_depth * 64,  # SAM vit-b: 12 * 64
                depth=self.encoder_depth, num_heads=self.num_heads,
                out_chans=self.embed_dim,
            )(images, training=training)
        else:
            emb = ImageEncoderLite(
                embed_dim=self.embed_dim, patch_size=self.patch_size,
                depth=self.encoder_depth, num_heads=self.num_heads,
            )(images, training=training)
        sparse = PromptEncoderLite(embed_dim=self.embed_dim)(boxes, (H, W))
        low_res, iou = MaskDecoderLite(
            embed_dim=self.embed_dim, depth=self.decoder_depth,
            num_heads=self.num_heads, num_mask_tokens=self.num_mask_tokens,
        )(emb, sparse, training=training)
        masks = jax.image.resize(
            low_res, (B, low_res.shape[1], H, W), method="linear"
        )
        return masks, iou


def segmentation_forward_outputs(
    pred_masks: Array, ious: Array, targets: Dict[str, Array]
) -> Dict[str, Array]:
    """Thresholded prediction dict matching the reference's `outputs`
    (model_utils.py:152-160)."""
    return {
        "masks": (pred_masks > 0.5).astype(jnp.uint8),
        "scores": ious,
        "labels": targets["labels"],
        "boxes": targets["boxes"],
    }
