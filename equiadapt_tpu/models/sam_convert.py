"""Convert a torch Segment-Anything checkpoint into SAMLite parameters.

The reference wraps facebookresearch SAM with a required pretrained
checkpoint (segmentation/model_utils.py:100-112). This environment has no
network egress to fetch one, so conversion is offered as a utility: given a
local `sam_vit_*.pth`, map the image-encoder patch embed / transformer
blocks / neck, the prompt-encoder point embeddings, and the mask-decoder
tokens onto a SAMLite built with matching dimensions.

The mapping is necessarily partial where SAMLite simplifies SAM (relative
position biases and the 3-mask multimask head are dropped); converted models
are meant as warm starts for the prior-regularized finetuning flow, not
drop-in SAM replicas.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

__all__ = ["convert_sam_checkpoint", "sam_vit_b_config"]


def sam_vit_b_config() -> Dict[str, Any]:
    """SAMLite constructor kwargs matching SAM ViT-B dimensions."""
    return dict(embed_dim=256, encoder_depth=12, decoder_depth=2,
                num_heads=12, patch_size=16)


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def convert_sam_checkpoint(state_dict: Dict[str, Any], params: Dict[str, Any]) -> Dict[str, Any]:
    """Map a torch SAM state dict onto a SAMLite params pytree.

    Args:
        state_dict: torch SAM `model.state_dict()` (keys like
            `image_encoder.blocks.0.attn.qkv.weight`).
        params: an initialized SAMLite params dict (template for shapes).

    Returns:
        A new params dict with every mappable leaf replaced.
    """
    import copy

    out = copy.deepcopy(jax_to_plain(params))
    enc = out.get("ImageEncoderLite_0", out)

    # patch embedding: torch conv (O, I, K, K) -> flax HWIO
    if "image_encoder.patch_embed.proj.weight" in state_dict:
        w = _t(state_dict["image_encoder.patch_embed.proj.weight"])
        enc["Conv_0"]["kernel"] = w.transpose(2, 3, 1, 0)
        enc["Conv_0"]["bias"] = _t(state_dict["image_encoder.patch_embed.proj.bias"])
    if "image_encoder.pos_embed" in state_dict and "pos_embedding" in enc:
        pe = _t(state_dict["image_encoder.pos_embed"])  # (1, h, w, C)
        enc["pos_embedding"] = pe.reshape(1, -1, pe.shape[-1])

    # transformer blocks: qkv fused in SAM -> split into flax MHA q/k/v
    i = 0
    while f"image_encoder.blocks.{i}.attn.qkv.weight" in state_dict:
        blk = enc.get(f"EncoderBlock_{i}")
        if blk is None:
            break
        C = _t(state_dict[f"image_encoder.blocks.{i}.attn.qkv.weight"]).shape[1]
        qkv_w = _t(state_dict[f"image_encoder.blocks.{i}.attn.qkv.weight"])
        qkv_b = _t(state_dict[f"image_encoder.blocks.{i}.attn.qkv.bias"])
        heads = None
        mha = blk["MultiHeadDotProductAttention_0"]
        heads = mha["query"]["kernel"].shape[1]
        hd = C // heads
        for j, name in enumerate(("query", "key", "value")):
            w = qkv_w[j * C : (j + 1) * C].T.reshape(C, heads, hd)
            b = qkv_b[j * C : (j + 1) * C].reshape(heads, hd)
            mha[name]["kernel"] = w
            mha[name]["bias"] = b
        proj_w = _t(state_dict[f"image_encoder.blocks.{i}.attn.proj.weight"])
        mha["out"]["kernel"] = proj_w.T.reshape(heads, hd, C)
        mha["out"]["bias"] = _t(state_dict[f"image_encoder.blocks.{i}.attn.proj.bias"])
        for ln_t, ln_j in (("norm1", "LayerNorm_0"), ("norm2", "LayerNorm_1")):
            blk[ln_j]["scale"] = _t(state_dict[f"image_encoder.blocks.{i}.{ln_t}.weight"])
            blk[ln_j]["bias"] = _t(state_dict[f"image_encoder.blocks.{i}.{ln_t}.bias"])
        blk["Dense_0"]["kernel"] = _t(state_dict[f"image_encoder.blocks.{i}.mlp.lin1.weight"]).T
        blk["Dense_0"]["bias"] = _t(state_dict[f"image_encoder.blocks.{i}.mlp.lin1.bias"])
        blk["Dense_1"]["kernel"] = _t(state_dict[f"image_encoder.blocks.{i}.mlp.lin2.weight"]).T
        blk["Dense_1"]["bias"] = _t(state_dict[f"image_encoder.blocks.{i}.mlp.lin2.bias"])
        i += 1

    # neck convs
    if "image_encoder.neck.0.weight" in state_dict:
        enc["Conv_1"]["kernel"] = _t(state_dict["image_encoder.neck.0.weight"]).transpose(2, 3, 1, 0)
        enc["Conv_2"]["kernel"] = _t(state_dict["image_encoder.neck.2.weight"]).transpose(2, 3, 1, 0)

    # prompt encoder: corner-type embeddings (point_embeddings 2 and 3 are
    # the box corners in SAM)
    pe = out.get("PromptEncoderLite_0")
    if pe is not None and "prompt_encoder.point_embeddings.2.weight" in state_dict:
        pe["corner_embed"] = np.stack(
            [
                _t(state_dict["prompt_encoder.point_embeddings.2.weight"])[0],
                _t(state_dict["prompt_encoder.point_embeddings.3.weight"])[0],
            ]
        )
        if "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix" in state_dict:
            pe["pe_gaussian"] = _t(
                state_dict["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]
            )

    # mask decoder: tokens, per-token hypernetwork MLPs, iou head, upscaling
    dec = out.get("MaskDecoderLite_0")
    if dec is not None and "mask_decoder.iou_token.weight" in state_dict:
        sd = state_dict
        dec["iou_token"] = _t(sd["mask_decoder.iou_token.weight"])
        mt = _t(sd["mask_decoder.mask_tokens.weight"])  # (4, C) in SAM
        T = dec["mask_tokens"].shape[0]
        dec["mask_tokens"] = mt[:T]
        for j in range(T):
            pre = f"mask_decoder.output_hypernetworks_mlps.{j}.layers"
            for li in range(3):
                if f"{pre}.{li}.weight" not in sd:
                    break
                dec[f"hyper{j}_{li}"]["kernel"] = _t(sd[f"{pre}.{li}.weight"]).T
                dec[f"hyper{j}_{li}"]["bias"] = _t(sd[f"{pre}.{li}.bias"])
        for li in range(3):
            k = f"mask_decoder.iou_prediction_head.layers.{li}.weight"
            if k not in sd:
                break
            w = _t(sd[k]).T
            b = _t(sd[f"mask_decoder.iou_prediction_head.layers.{li}.bias"])
            if li == 2:  # final layer: keep only the first T mask scores
                w, b = w[:, :T], b[:T]
            dec[f"iou_head_{li}"]["kernel"] = w
            dec[f"iou_head_{li}"]["bias"] = b
        # output upscaling: torch ConvTranspose2d (in, out, k, k) -> flax
        # (k, k, in, out); LayerNorm2d weights map to the NHWC LayerNorm
        if "mask_decoder.output_upscaling.0.weight" in sd:
            dec["upscale_conv1"]["kernel"] = _t(
                sd["mask_decoder.output_upscaling.0.weight"]
            ).transpose(2, 3, 0, 1)
            dec["upscale_conv1"]["bias"] = _t(sd["mask_decoder.output_upscaling.0.bias"])
            dec["upscale_ln"]["scale"] = _t(sd["mask_decoder.output_upscaling.1.weight"])
            dec["upscale_ln"]["bias"] = _t(sd["mask_decoder.output_upscaling.1.bias"])
            dec["upscale_conv2"]["kernel"] = _t(
                sd["mask_decoder.output_upscaling.3.weight"]
            ).transpose(2, 3, 0, 1)
            dec["upscale_conv2"]["bias"] = _t(sd["mask_decoder.output_upscaling.3.bias"])

    return out


def jax_to_plain(tree):
    """Recursively convert FrozenDict / arrays to plain dict / numpy."""
    if hasattr(tree, "items"):
        return {k: jax_to_plain(v) for k, v in tree.items()}
    return np.asarray(tree)


def convert_sam_vit_encoder(
    state_dict: Dict[str, Any], params: Dict[str, Any], prefix: str = "image_encoder."
) -> Dict[str, Any]:
    """Map a torch SAM image-encoder state dict onto SamVitEncoder params.

    Complete (every torch leaf is consumed): patch embed, 2-D positional
    embedding, per-block norms / fused qkv / proj / decomposed relative
    position tables / MLP, and the neck convs + LayerNorm2d weights. Torch
    Linear weights (out, in) transpose to flax kernels (in, out); convs
    (O, I, K, K) -> HWIO. Equivalence of the converted forward against a
    numpy reimplementation of the torch encoder is asserted in
    tests/test_sam_convert.py.
    """
    out = jax_to_plain(params)
    sd, pre = state_dict, prefix

    def has(k):
        return pre + k in sd

    def g(k):
        return _t(sd[pre + k])

    out["patch_embed"]["kernel"] = g("patch_embed.proj.weight").transpose(2, 3, 1, 0)
    out["patch_embed"]["bias"] = g("patch_embed.proj.bias")
    if has("pos_embed"):
        out["pos_embed"] = g("pos_embed")  # torch stores (1, h, w, C) already

    i = 0
    while has(f"blocks.{i}.norm1.weight"):
        b = out[f"block{i}"]
        for ln in ("norm1", "norm2"):
            b[ln]["scale"] = g(f"blocks.{i}.{ln}.weight")
            b[ln]["bias"] = g(f"blocks.{i}.{ln}.bias")
        attn = b["attn"]
        attn["qkv"]["kernel"] = g(f"blocks.{i}.attn.qkv.weight").T
        attn["qkv"]["bias"] = g(f"blocks.{i}.attn.qkv.bias")
        attn["proj"]["kernel"] = g(f"blocks.{i}.attn.proj.weight").T
        attn["proj"]["bias"] = g(f"blocks.{i}.attn.proj.bias")
        if has(f"blocks.{i}.attn.rel_pos_h"):
            attn["rel_pos_h"] = g(f"blocks.{i}.attn.rel_pos_h")
            attn["rel_pos_w"] = g(f"blocks.{i}.attn.rel_pos_w")
        b["lin1"]["kernel"] = g(f"blocks.{i}.mlp.lin1.weight").T
        b["lin1"]["bias"] = g(f"blocks.{i}.mlp.lin1.bias")
        b["lin2"]["kernel"] = g(f"blocks.{i}.mlp.lin2.weight").T
        b["lin2"]["bias"] = g(f"blocks.{i}.mlp.lin2.bias")
        i += 1

    out["neck_conv1"]["kernel"] = g("neck.0.weight").transpose(2, 3, 1, 0)
    out["neck_ln1"]["scale"] = g("neck.1.weight")
    out["neck_ln1"]["bias"] = g("neck.1.bias")
    out["neck_conv2"]["kernel"] = g("neck.2.weight").transpose(2, 3, 1, 0)
    out["neck_ln2"]["scale"] = g("neck.3.weight")
    out["neck_ln2"]["bias"] = g("neck.3.bias")
    return out
