"""Pretrained-SAM encoder conversion, validated end-to-end.

Builds a synthetically initialized state dict with the EXACT key structure
and tensor layouts of a facebookresearch sam_vit_b checkpoint's image
encoder (scaled-down dims — no download needed), converts it with
`convert_sam_vit_encoder`, and asserts the flax `SamVitEncoder` forward
matches an independent numpy reimplementation of the torch encoder
semantics (windowed attention, decomposed rel-pos biases, erf-GELU,
eps=1e-6 LayerNorms, LayerNorm2d neck) to fp32 tolerance.

This is the BASELINE.md config-5 credibility gate: prior-regularized
finetuning of a *frozen pretrained* SAM requires the converted encoder to
reproduce torch-SAM features.
"""

import jax
import jax.numpy as jnp
import numpy as np

from equiadapt_tpu.models.sam_convert import convert_sam_vit_encoder
from equiadapt_tpu.models.sam_encoder import SamVitEncoder

# scaled-down sam_vit_b-structured config
IMG, PATCH, EMBED, DEPTH, HEADS, OUT = 32, 8, 16, 3, 2, 12
WINDOW, GLOBAL_IDX, MLP_RATIO = 2, (1,), 4.0
GRID = IMG // PATCH  # 4


def _make_state_dict(rng):
    """Random tensors in the torch sam_vit_b image-encoder layout."""
    sd = {}
    u = lambda *s: rng.normal(0, 0.5, s).astype(np.float32)
    sd["image_encoder.patch_embed.proj.weight"] = u(EMBED, 3, PATCH, PATCH)
    sd["image_encoder.patch_embed.proj.bias"] = u(EMBED)
    sd["image_encoder.pos_embed"] = u(1, GRID, GRID, EMBED)
    hd = EMBED // HEADS
    for i in range(DEPTH):
        p = f"image_encoder.blocks.{i}."
        sd[p + "norm1.weight"] = u(EMBED) * 0.1 + 1.0
        sd[p + "norm1.bias"] = u(EMBED) * 0.1
        sd[p + "attn.qkv.weight"] = u(3 * EMBED, EMBED) * 0.2
        sd[p + "attn.qkv.bias"] = u(3 * EMBED) * 0.1
        sd[p + "attn.proj.weight"] = u(EMBED, EMBED) * 0.2
        sd[p + "attn.proj.bias"] = u(EMBED) * 0.1
        size = GRID if i in GLOBAL_IDX else WINDOW
        sd[p + "attn.rel_pos_h"] = u(2 * size - 1, hd) * 0.2
        sd[p + "attn.rel_pos_w"] = u(2 * size - 1, hd) * 0.2
        sd[p + "norm2.weight"] = u(EMBED) * 0.1 + 1.0
        sd[p + "norm2.bias"] = u(EMBED) * 0.1
        mlp = int(EMBED * MLP_RATIO)
        sd[p + "mlp.lin1.weight"] = u(mlp, EMBED) * 0.2
        sd[p + "mlp.lin1.bias"] = u(mlp) * 0.1
        sd[p + "mlp.lin2.weight"] = u(EMBED, mlp) * 0.2
        sd[p + "mlp.lin2.bias"] = u(EMBED) * 0.1
    sd["image_encoder.neck.0.weight"] = u(OUT, EMBED, 1, 1) * 0.3
    sd["image_encoder.neck.1.weight"] = u(OUT) * 0.1 + 1.0
    sd["image_encoder.neck.1.bias"] = u(OUT) * 0.1
    sd["image_encoder.neck.2.weight"] = u(OUT, OUT, 3, 3) * 0.2
    sd["image_encoder.neck.3.weight"] = u(OUT) * 0.1 + 1.0
    sd["image_encoder.neck.3.bias"] = u(OUT) * 0.1
    return sd


# ---------------- numpy replica of the torch forward -------------------


def _ln(x, w, b, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b



def _erf_gelu(x):
    import math

    # torch nn.GELU default: 0.5 x (1 + erf(x / sqrt(2)))
    from numpy import vectorize

    erf = np.vectorize(math.erf)
    return 0.5 * x * (1.0 + erf(x / math.sqrt(2.0)))


def _window_partition_np(x, ws):
    B, H, W, C = x.shape
    pad_h = (ws - H % ws) % ws
    pad_w = (ws - W % ws) % ws
    if pad_h or pad_w:
        x = np.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    return (
        x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C),
        (Hp, Wp),
    )


def _window_unpartition_np(win, ws, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = win.shape[0] // (Hp * Wp // ws // ws)
    x = win.reshape(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W, :]


def _attn_np(x, sd, p, heads):
    """SAM Attention.forward on (B, H, W, C)."""
    B, H, W, C = x.shape
    hd = C // heads
    qkv_w, qkv_b = sd[p + "attn.qkv.weight"], sd[p + "attn.qkv.bias"]
    qkv = x.reshape(B, H * W, C) @ qkv_w.T + qkv_b
    qkv = qkv.reshape(B, H * W, 3, heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * hd**-0.5) @ k.transpose(0, 1, 3, 2)
    # decomposed rel pos (q/k sizes equal): coords[i,j] = i - j + size - 1
    Rh_t, Rw_t = sd[p + "attn.rel_pos_h"], sd[p + "attn.rel_pos_w"]
    ii = np.arange(H)[:, None] - np.arange(H)[None, :] + H - 1
    jj = np.arange(W)[:, None] - np.arange(W)[None, :] + W - 1
    Rh, Rw = Rh_t[ii], Rw_t[jj]  # (H, H, hd), (W, W, hd)
    r_q = q.reshape(B, heads, H, W, hd)
    bias_h = np.einsum("bnhwc,hkc->bnhwk", r_q, Rh)
    bias_w = np.einsum("bnhwc,wkc->bnhwk", r_q, Rw)
    attn = attn.reshape(B, heads, H, W, H, W)
    attn = attn + bias_h[..., :, None] + bias_w[..., None, :]
    attn = attn.reshape(B, heads, H * W, H * W)
    attn = np.exp(attn - attn.max(-1, keepdims=True))
    attn = attn / attn.sum(-1, keepdims=True)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, H * W, C)
    out = out @ sd[p + "attn.proj.weight"].T + sd[p + "attn.proj.bias"]
    return out.reshape(B, H, W, C)


def _conv_np(x, w_oihw, bias=None, pad=0):
    """NHWC conv with torch OIHW weights (stride 1)."""
    O, I, Kh, Kw = w_oihw.shape
    B, H, W, C = x.shape
    if pad:
        x = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    Ho, Wo = x.shape[1] - Kh + 1, x.shape[2] - Kw + 1
    out = np.zeros((B, Ho, Wo, O), np.float32)
    for dy in range(Kh):
        for dx in range(Kw):
            out += x[:, dy:dy + Ho, dx:dx + Wo, :] @ w_oihw[:, :, dy, dx].T
    if bias is not None:
        out = out + bias
    return out


def _torch_sam_encoder_np(x, sd):
    """numpy forward with torch-SAM semantics."""
    pre = "image_encoder."
    w = sd[pre + "patch_embed.proj.weight"]  # (E, 3, P, P) stride P
    B, H, W, _ = x.shape
    h, wd = H // PATCH, W // PATCH
    patches = x.reshape(B, h, PATCH, wd, PATCH, 3).transpose(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(B, h, wd, PATCH * PATCH * 3)
    wk = w.transpose(2, 3, 1, 0).reshape(PATCH * PATCH * 3, EMBED)
    t = patches @ wk + sd[pre + "patch_embed.proj.bias"]
    t = t + sd[pre + "pos_embed"]
    for i in range(DEPTH):
        p = f"{pre}blocks.{i}."
        shortcut = t
        t = _ln(t, sd[p + "norm1.weight"], sd[p + "norm1.bias"])
        ws = 0 if i in GLOBAL_IDX else WINDOW
        if ws > 0:
            hw = (t.shape[1], t.shape[2])
            t, pad_hw = _window_partition_np(t, ws)
        t = _attn_np(t, sd, p, HEADS)
        if ws > 0:
            t = _window_unpartition_np(t, ws, pad_hw, hw)
        t = shortcut + t
        y = _ln(t, sd[p + "norm2.weight"], sd[p + "norm2.bias"])
        y = y @ sd[p + "mlp.lin1.weight"].T + sd[p + "mlp.lin1.bias"]
        y = _erf_gelu(y)
        y = y @ sd[p + "mlp.lin2.weight"].T + sd[p + "mlp.lin2.bias"]
        t = t + y
    t = _conv_np(t, sd[pre + "neck.0.weight"])
    t = _ln(t, sd[pre + "neck.1.weight"], sd[pre + "neck.1.bias"])
    t = _conv_np(t, sd[pre + "neck.2.weight"], pad=1)
    t = _ln(t, sd[pre + "neck.3.weight"], sd[pre + "neck.3.bias"])
    return t


def test_converted_encoder_matches_torch_semantics():
    rng = np.random.default_rng(0)
    sd = _make_state_dict(rng)
    x = rng.normal(0, 1, (2, IMG, IMG, 3)).astype(np.float32)

    enc = SamVitEncoder(
        img_size=IMG, patch_size=PATCH, embed_dim=EMBED, depth=DEPTH,
        num_heads=HEADS, out_chans=OUT, window_size=WINDOW,
        global_attn_indexes=GLOBAL_IDX, mlp_ratio=MLP_RATIO,
    )
    template = enc.init(jax.random.key(0), jnp.asarray(x))
    converted = convert_sam_vit_encoder(sd, template["params"])
    ours = np.asarray(enc.apply({"params": converted}, jnp.asarray(x)))

    ref = _torch_sam_encoder_np(x, sd)
    assert ours.shape == ref.shape == (2, GRID, GRID, OUT)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_converter_consumes_every_torch_leaf():
    """Every key in the (encoder) state dict must influence the converted
    params — no silently dropped weights (the round-1 gap)."""
    rng = np.random.default_rng(1)
    sd = _make_state_dict(rng)
    x = np.zeros((1, IMG, IMG, 3), np.float32)
    enc = SamVitEncoder(
        img_size=IMG, patch_size=PATCH, embed_dim=EMBED, depth=DEPTH,
        num_heads=HEADS, out_chans=OUT, window_size=WINDOW,
        global_attn_indexes=GLOBAL_IDX, mlp_ratio=MLP_RATIO,
    )
    template = enc.init(jax.random.key(0), jnp.asarray(x))["params"]
    base = convert_sam_vit_encoder(sd, template)
    flat_base = jax.tree_util.tree_leaves(base)
    for key in sd:
        sd2 = {k: (v + 1.0 if k == key else v) for k, v in sd.items()}
        flat2 = jax.tree_util.tree_leaves(convert_sam_vit_encoder(sd2, template))
        changed = any(
            not np.array_equal(a, b) for a, b in zip(flat_base, flat2)
        )
        assert changed, f"state-dict key not consumed by converter: {key}"
