"""SAM checkpoint conversion: numpy state-dict -> SAMLite params mapping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equiadapt_tpu.models.sam_convert import convert_sam_checkpoint, jax_to_plain
from equiadapt_tpu.models.segmentation import SAMLite


@pytest.mark.slow
def test_convert_maps_encoder_and_tokens():
    m = SAMLite(embed_dim=32, encoder_depth=1, decoder_depth=1, num_heads=2,
                patch_size=8)
    x = jnp.zeros((1, 32, 32, 3))
    boxes = jnp.zeros((1, 2, 4))
    variables = m.init(jax.random.key(0), x, boxes)
    params = variables["params"]

    plain = jax_to_plain(params)
    enc = plain["ImageEncoderLite_0"]
    width = enc["Conv_0"]["kernel"].shape[-1]
    heads = enc["EncoderBlock_0"]["MultiHeadDotProductAttention_0"]["query"]["kernel"].shape[1]
    mlp_dim = enc["EncoderBlock_0"]["Dense_0"]["kernel"].shape[-1]
    rng = np.random.default_rng(0)

    sd = {
        "image_encoder.patch_embed.proj.weight": rng.normal(size=(width, 3, 8, 8)).astype(np.float32),
        "image_encoder.patch_embed.proj.bias": rng.normal(size=(width,)).astype(np.float32),
        "image_encoder.blocks.0.attn.qkv.weight": rng.normal(size=(3 * width, width)).astype(np.float32),
        "image_encoder.blocks.0.attn.qkv.bias": rng.normal(size=(3 * width,)).astype(np.float32),
        "image_encoder.blocks.0.attn.proj.weight": rng.normal(size=(width, width)).astype(np.float32),
        "image_encoder.blocks.0.attn.proj.bias": rng.normal(size=(width,)).astype(np.float32),
        "image_encoder.blocks.0.norm1.weight": rng.normal(size=(width,)).astype(np.float32),
        "image_encoder.blocks.0.norm1.bias": rng.normal(size=(width,)).astype(np.float32),
        "image_encoder.blocks.0.norm2.weight": rng.normal(size=(width,)).astype(np.float32),
        "image_encoder.blocks.0.norm2.bias": rng.normal(size=(width,)).astype(np.float32),
        "image_encoder.blocks.0.mlp.lin1.weight": rng.normal(size=(mlp_dim, width)).astype(np.float32),
        "image_encoder.blocks.0.mlp.lin1.bias": rng.normal(size=(mlp_dim,)).astype(np.float32),
        "image_encoder.blocks.0.mlp.lin2.weight": rng.normal(size=(width, mlp_dim)).astype(np.float32),
        "image_encoder.blocks.0.mlp.lin2.bias": rng.normal(size=(width,)).astype(np.float32),
        "prompt_encoder.point_embeddings.2.weight": rng.normal(size=(1, 32)).astype(np.float32),
        "prompt_encoder.point_embeddings.3.weight": rng.normal(size=(1, 32)).astype(np.float32),
        "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix": rng.normal(size=(2, 16)).astype(np.float32),
        "mask_decoder.iou_token.weight": rng.normal(size=(1, 32)).astype(np.float32),
        "mask_decoder.mask_tokens.weight": rng.normal(size=(4, 32)).astype(np.float32),
    }

    out = convert_sam_checkpoint(sd, params)
    enc2 = out["ImageEncoderLite_0"]
    # patch embed converted to HWIO
    np.testing.assert_allclose(
        enc2["Conv_0"]["kernel"],
        sd["image_encoder.patch_embed.proj.weight"].transpose(2, 3, 1, 0),
    )
    # qkv split round-trips: recombine flax heads back to the torch layout
    q = enc2["EncoderBlock_0"]["MultiHeadDotProductAttention_0"]["query"]["kernel"]
    q_torch = sd["image_encoder.blocks.0.attn.qkv.weight"][:width]
    np.testing.assert_allclose(q.reshape(width, width), q_torch.T, atol=1e-6)
    # layer norms mapped
    np.testing.assert_allclose(
        enc2["EncoderBlock_0"]["LayerNorm_0"]["scale"],
        sd["image_encoder.blocks.0.norm1.weight"],
    )
    # decoder tokens (iou_token is (1, C), mask_tokens (T, C))
    np.testing.assert_allclose(
        out["MaskDecoderLite_0"]["iou_token"][0],
        sd["mask_decoder.iou_token.weight"][0],
    )
    np.testing.assert_allclose(
        out["MaskDecoderLite_0"]["mask_tokens"][0],
        sd["mask_decoder.mask_tokens.weight"][0],
    )
    # converted tree still works in the model
    logits, ious = m.apply({"params": out}, x, boxes)
    assert np.isfinite(np.asarray(logits)).all()
