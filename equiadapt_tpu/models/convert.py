"""Convert torchvision classification checkpoints into flax parameters.

The reference's central workflow is adapting a *frozen pretrained*
prediction network via learned canonicalization + prior regularization; its
classification path loads torchvision weights with ``weights="DEFAULT"``
(reference examples/images/classification/model_utils.py:35-60, freeze at
:66-71). This environment has no network egress, so conversion is offered
as a utility: given a local ``state_dict`` (``torch.load`` of a torchvision
``resnet50``/``resnet18``/``wide_resnet*``/``vit_b_16`` checkpoint), map it
onto the matching flax module from ``models/resnet.py`` / ``models/vit.py``.

Conventions (asserted by the oracle parity tests in
tests/test_pretrained_convert.py):
  * torch conv weights (O, I, kh, kw) -> flax HWIO;
  * torch Linear weights (out, in) -> flax kernels (in, out);
  * BatchNorm weight/bias -> params scale/bias, running stats ->
    ``batch_stats`` mean/var;
  * fused ViT ``in_proj`` (3C, C) splits into flax MHA query/key/value
    kernels (C, heads, head_dim).

Every checkpoint leaf must be consumed (``num_batches_tracked`` excepted);
unexpectedly-shaped leaves raise unless they are one of the two deliberate
reference surgeries: the CIFAR stem (reference model_utils.py:61-65 swaps
conv1 for a fresh 3x3) and the classification head (model_utils.py:73-79
replaces fc for the dataset's class count) — those keep the template's
fresh values, mirroring what the reference does after loading DEFAULT
weights.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

__all__ = [
    "convert_resnet_checkpoint",
    "convert_vit_checkpoint",
    "load_torch_state_dict",
    "load_pretrained_prediction",
    "apply_pretrained_to_state",
]


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _plain(tree):
    """FrozenDict / jax arrays -> plain dict / numpy (deep copy)."""
    if hasattr(tree, "items"):
        return {k: _plain(v) for k, v in tree.items()}
    return np.array(tree)


class _Consumer:
    """Tracks which checkpoint keys were used; raises on leftovers."""

    def __init__(self, state_dict: Dict[str, Any]):
        self.sd = state_dict
        self.used: set = set()

    def __contains__(self, key: str) -> bool:
        return key in self.sd

    def take(self, key: str) -> np.ndarray:
        self.used.add(key)
        return _t(self.sd[key])

    def finish(self) -> None:
        leftovers = [
            k for k in self.sd
            if k not in self.used and not k.endswith("num_batches_tracked")
        ]
        if leftovers:
            raise ValueError(
                f"checkpoint keys not consumed by the converter "
                f"(unknown architecture variant?): {sorted(leftovers)[:10]}"
                + ("..." if len(leftovers) > 10 else "")
            )


def _put_conv(dst: Dict[str, Any], w: np.ndarray, *, allow_skip: bool = False) -> bool:
    """Place a torch conv weight; returns False when the template shape
    differs and `allow_skip` keeps the fresh template values (the
    reference's stem-surgery behavior)."""
    hwio = w.transpose(2, 3, 1, 0)
    if hwio.shape != dst["kernel"].shape:
        if allow_skip:
            return False
        raise ValueError(
            f"conv shape mismatch: checkpoint {hwio.shape} vs template "
            f"{dst['kernel'].shape}"
        )
    dst["kernel"] = hwio.astype(dst["kernel"].dtype)
    return True


def _put_bn(params_bn: Dict[str, Any], stats_bn: Dict[str, Any],
            sd: _Consumer, prefix: str) -> None:
    params_bn["scale"] = sd.take(f"{prefix}.weight").astype(params_bn["scale"].dtype)
    params_bn["bias"] = sd.take(f"{prefix}.bias").astype(params_bn["bias"].dtype)
    stats_bn["mean"] = sd.take(f"{prefix}.running_mean").astype(stats_bn["mean"].dtype)
    stats_bn["var"] = sd.take(f"{prefix}.running_var").astype(stats_bn["var"].dtype)


def convert_resnet_checkpoint(
    state_dict: Dict[str, Any], variables: Dict[str, Any]
) -> Dict[str, Any]:
    """Map a torchvision ResNet ``state_dict`` onto flax ``variables``.

    Args:
        state_dict: torchvision ``resnet18/34/50/101 / wide_resnet50_2/...``
            weights (keys ``conv1.weight``, ``layer{i}.{j}.conv{k}.weight``,
            ``...downsample.0/1``, ``fc.weight`` — torchvision
            models/resnet.py naming, mirrored by reference
            model_utils.py:35-46).
        variables: ``{"params": ..., "batch_stats": ...}`` from
            ``ResNet*.init`` — the template that decides block class
            (BasicBlock/Bottleneck), stage sizes and surgeries.

    Returns:
        A plain ``{"params", "batch_stats"}`` dict with every mappable leaf
        replaced. CIFAR-stem (``small_images=True``) and replaced-head
        templates keep their fresh values, as the reference does after
        loading pretrained weights (model_utils.py:61-79).
    """
    out = _plain(variables)
    params, stats = out["params"], out["batch_stats"]
    sd = _Consumer(state_dict)

    block_names = sorted(
        (k for k in params if k.startswith(("Bottleneck_", "BasicBlock_"))),
        key=lambda s: int(s.split("_")[1]),
    )
    if not block_names:
        raise ValueError("template has no ResNet blocks — wrong variables tree?")
    convs_per_block = 3 if block_names[0].startswith("Bottleneck") else 2

    # stem: conv1 skipped (template kept) when the model was built with the
    # CIFAR 3x3 stem; bn1 converts either way (the reference surgery only
    # replaces the conv, model_utils.py:61-65)
    _put_conv(params["Conv_0"], sd.take("conv1.weight"), allow_skip=True)
    _put_bn(params["BatchNorm_0"], stats["BatchNorm_0"], sd, "bn1")

    b = 0  # flat flax block index
    for stage in (1, 2, 3, 4):
        j = 0
        while f"layer{stage}.{j}.conv1.weight" in sd:
            blk_p, blk_s = params[block_names[b]], stats[block_names[b]]
            for c in range(convs_per_block):
                _put_conv(blk_p[f"Conv_{c}"],
                          sd.take(f"layer{stage}.{j}.conv{c + 1}.weight"))
                _put_bn(blk_p[f"BatchNorm_{c}"], blk_s[f"BatchNorm_{c}"],
                        sd, f"layer{stage}.{j}.bn{c + 1}")
            if f"layer{stage}.{j}.downsample.0.weight" in sd:
                dkey = f"Conv_{convs_per_block}"
                if dkey not in blk_p:
                    raise ValueError(
                        f"checkpoint has a downsample at layer{stage}.{j} "
                        f"but template block {block_names[b]} has none"
                    )
                _put_conv(blk_p[dkey],
                          sd.take(f"layer{stage}.{j}.downsample.0.weight"))
                _put_bn(blk_p[f"BatchNorm_{convs_per_block}"],
                        blk_s[f"BatchNorm_{convs_per_block}"],
                        sd, f"layer{stage}.{j}.downsample.1")
            j += 1
            b += 1
    if b != len(block_names):
        raise ValueError(
            f"checkpoint has {b} blocks but template has {len(block_names)} "
            "— architecture mismatch (stage sizes / depth)"
        )

    # head: replaced for non-1000-class datasets (reference
    # model_utils.py:73-79) — keep the fresh template then. Headless
    # templates (num_classes=None backbones, e.g. the MaskRCNNLite trunk)
    # consume and drop fc.
    if "fc.weight" in sd:
        w = sd.take("fc.weight").T
        bias = sd.take("fc.bias")
        if "Dense_0" in params and w.shape == params["Dense_0"]["kernel"].shape:
            params["Dense_0"]["kernel"] = w.astype(params["Dense_0"]["kernel"].dtype)
            params["Dense_0"]["bias"] = bias.astype(params["Dense_0"]["bias"].dtype)
    sd.finish()
    return out


def convert_vit_checkpoint(
    state_dict: Dict[str, Any], params: Dict[str, Any]
) -> Dict[str, Any]:
    """Map a torchvision ``vit_b_16``-family ``state_dict`` onto flax ViT
    params (models/vit.py; reference model_utils.py:48-60 loads
    ``vit_b_16(weights="DEFAULT")``).

    Accepts both torchvision MLP naming generations (``mlp.0/mlp.3`` and the
    pre-0.13 ``mlp.linear_1/linear_2``). The classification head is kept
    fresh when the template's class count differs (the reference replaces
    ``heads`` for the dataset, model_utils.py:73-79).
    """
    out = _plain(params)
    sd = _Consumer(state_dict)

    _put_conv(out["Conv_0"], sd.take("conv_proj.weight"))
    out["Conv_0"]["bias"] = sd.take("conv_proj.bias").astype(
        out["Conv_0"]["bias"].dtype
    )
    out["cls_token"] = sd.take("class_token").astype(out["cls_token"].dtype)
    pos = sd.take("encoder.pos_embedding")
    if pos.shape != out["pos_embedding"].shape:
        raise ValueError(
            f"pos_embedding mismatch: checkpoint {pos.shape} vs template "
            f"{out['pos_embedding'].shape} — image_size/patch_size differ"
        )
    out["pos_embedding"] = pos.astype(out["pos_embedding"].dtype)

    i = 0
    while f"encoder.layers.encoder_layer_{i}.ln_1.weight" in sd:
        pre = f"encoder.layers.encoder_layer_{i}"
        blk = out.get(f"EncoderBlock_{i}")
        if blk is None:
            raise ValueError(
                f"checkpoint layer {i} has no template block — depth mismatch"
            )
        for ln_t, ln_j in (("ln_1", "LayerNorm_0"), ("ln_2", "LayerNorm_1")):
            blk[ln_j]["scale"] = sd.take(f"{pre}.{ln_t}.weight")
            blk[ln_j]["bias"] = sd.take(f"{pre}.{ln_t}.bias")
        mha = blk["MultiHeadDotProductAttention_0"]
        C, heads = mha["query"]["kernel"].shape[:2]
        hd = C // heads
        in_w = sd.take(f"{pre}.self_attention.in_proj_weight")  # (3C, C)
        in_b = sd.take(f"{pre}.self_attention.in_proj_bias")
        for j, name in enumerate(("query", "key", "value")):
            mha[name]["kernel"] = in_w[j * C:(j + 1) * C].T.reshape(C, heads, hd)
            mha[name]["bias"] = in_b[j * C:(j + 1) * C].reshape(heads, hd)
        mha["out"]["kernel"] = (
            sd.take(f"{pre}.self_attention.out_proj.weight").T.reshape(heads, hd, C)
        )
        mha["out"]["bias"] = sd.take(f"{pre}.self_attention.out_proj.bias")
        mlp_keys = (
            ("mlp.0", "mlp.3") if f"{pre}.mlp.0.weight" in sd
            else ("mlp.linear_1", "mlp.linear_2")
        )
        for dense, mk in zip(("Dense_0", "Dense_1"), mlp_keys):
            blk[dense]["kernel"] = sd.take(f"{pre}.{mk}.weight").T
            blk[dense]["bias"] = sd.take(f"{pre}.{mk}.bias")
        i += 1

    out["LayerNorm_0"]["scale"] = sd.take("encoder.ln.weight")
    out["LayerNorm_0"]["bias"] = sd.take("encoder.ln.bias")
    if "heads.head.weight" in sd:
        w = sd.take("heads.head.weight").T
        bias = sd.take("heads.head.bias")
        if w.shape == out["Dense_0"]["kernel"].shape:
            out["Dense_0"]["kernel"] = w
            out["Dense_0"]["bias"] = bias
    sd.finish()
    return out


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """``torch.load`` a checkpoint file and unwrap common containers
    (raw state_dict, ``{"state_dict": ...}``, ``{"model": ...}``)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    for wrapper in ("state_dict", "model"):
        if isinstance(obj, dict) and wrapper in obj and not any(
            hasattr(v, "shape") for v in obj.values() if not isinstance(v, dict)
        ):
            obj = obj[wrapper]
    return obj


def load_pretrained_prediction(
    architecture: str, path: str, variables: Dict[str, Any]
) -> Dict[str, Any]:
    """Convert the checkpoint at ``path`` for ``architecture`` onto the
    prediction network's ``variables`` template (the ``prediction.pretrained``
    config knob's implementation; reference model_utils.py:35-60)."""
    sd = load_torch_state_dict(path)
    if architecture.startswith(("resnet", "wide_resnet", "wideresnet")):
        return convert_resnet_checkpoint(sd, variables)
    if architecture.startswith("vit"):
        params = convert_vit_checkpoint(sd, variables["params"])
        return {"params": params, "batch_stats": variables.get("batch_stats", {})}
    raise ValueError(
        f"no pretrained converter for architecture '{architecture}'"
    )


def _get_path(tree: Any, path: Tuple[str, ...]) -> Any:
    for k in path:
        if k not in tree:
            return {}
        tree = tree[k]
    return tree


def _set_path(tree: Any, path: Tuple[str, ...], value: Any) -> Any:
    """Immutable nested set preserving the mapping type at each level."""
    if not path:
        return value
    new = dict(tree)
    new[path[0]] = _set_path(tree[path[0]], path[1:], value)
    return type(tree)(new)


def apply_pretrained_to_state(
    state: Any, architecture: str, path: str,
    subtree: Any = "prediction_network",
) -> Any:
    """Load converted torchvision weights into one params subtree of a
    train state (the ``prediction.pretrained=true`` flow: frozen pretrained
    backbone + fresh canonicalizer, reference model_utils.py:35-71).

    ``subtree`` may be a key or a tuple path — e.g.
    ``("prediction_network", "backbone")`` targets MaskRCNNLite's
    ResNet-50 trunk (the reference's pretrained maskrcnn_resnet50_fpn
    backbone, segmentation/model_utils.py:14-36)."""
    import jax
    import jax.numpy as jnp

    sub = (subtree,) if isinstance(subtree, str) else tuple(subtree)
    params, stats = state.params, state.batch_stats
    converted = load_pretrained_prediction(
        architecture, path,
        {"params": _get_path(params, sub), "batch_stats": _get_path(stats, sub)},
    )
    as_jnp = lambda tree: jax.tree_util.tree_map(jnp.asarray, tree)
    new_params = _set_path(params, sub, as_jnp(converted["params"]))
    new_stats = stats
    if converted.get("batch_stats"):
        new_stats = _set_path(stats, sub, as_jnp(converted["batch_stats"]))
    return state.replace(params=new_params, batch_stats=new_stats)
