"""Tensor-parallel (Megatron-style) sharding for transformer prediction nets.

The reference's only distribution is DDP (SURVEY.md §5); DP and FSDP cover
its capability surface. This module goes beyond parity for TPU-scale
serving/finetuning of transformer prediction networks (ViT-B/16 and the
SAM ViT encoder family): a 2-D ("data", "model") mesh where attention
heads and MLP hidden units are sharded over the "model" axis — the
scaling-book recipe: annotate the parameter shardings, let XLA's SPMD
partitioner insert the all-reduces over ICI.

No step-function changes: like `fsdp.py`, the rules place the parameter
leaves with `NamedSharding`s and `jax.jit` infers everything else from the
committed inputs. The sharding pattern is the Megatron column/row split:

* qkv projection kernels (D, H, Dh): heads axis over "model" — column
  parallel, no communication on the way in;
* attention out kernel (H, Dh, D): heads axis over "model" — row
  parallel, one psum on the way out;
* MLP up kernel (D, M): M over "model" (column); MLP down kernel (M, D):
  M over "model" (row, one psum);
* everything else (LayerNorms, embeddings, conv stem, classifier head,
  canonicalization network) replicated.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh_2d",
    "vit_tp_spec",
    "sam_tp_spec",
    "shard_params_tp",
    "shard_state_tp",
    "check_tp_coverage",
]

SpecFn = Callable[[str, Tuple[int, ...]], Optional[P]]


def make_mesh_2d(
    n_data: int, n_model: int, axis_names: Tuple[str, str] = ("data", "model")
) -> Mesh:
    """(n_data, n_model) mesh. The "model" axis should map to the
    fastest ICI links (innermost devices) — `jax.devices()` order does
    this on a TPU slice."""
    devs = jax.devices()
    if len(devs) < n_data * n_model:
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
            f"have {len(devs)}"
        )
    grid = np.asarray(devs[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names)


_QKV_KERNEL = re.compile(r"MultiHeadDotProductAttention_\d+/(query|key|value)/kernel$")
_QKV_BIAS = re.compile(r"MultiHeadDotProductAttention_\d+/(query|key|value)/bias$")
_OUT_KERNEL = re.compile(r"MultiHeadDotProductAttention_\d+/out/kernel$")
_MLP_UP = re.compile(r"EncoderBlock_\d+/Dense_0/(kernel|bias)$")
_MLP_DOWN_KERNEL = re.compile(r"EncoderBlock_\d+/Dense_1/kernel$")


def vit_tp_spec(path: str, shape: Tuple[int, ...], axis: str = "model") -> Optional[P]:
    """Megatron split for the flax ViT/EncoderBlock layout (models/vit.py;
    the SAM encoder's Block/Attention modules follow the same Dense naming).

    Returns None for leaves that stay replicated. The sharded head/hidden
    dimensions must be divisible by the mesh's model-axis size — checked in
    `shard_params_tp`.
    """
    if _QKV_KERNEL.search(path) and len(shape) == 3:
        return P(None, axis, None)  # (D, heads, head_dim)
    if _QKV_BIAS.search(path) and len(shape) == 2:
        return P(axis, None)  # (heads, head_dim)
    if _OUT_KERNEL.search(path) and len(shape) == 3:
        return P(axis, None, None)  # (heads, head_dim, D)
    if _MLP_UP.search(path):
        if len(shape) == 2:
            return P(None, axis)  # (D, mlp_dim)
        if len(shape) == 1:
            return P(axis)  # (mlp_dim,)
    if _MLP_DOWN_KERNEL.search(path) and len(shape) == 2:
        return P(axis, None)  # (mlp_dim, D)
    return None


_SAM_QKV = re.compile(r"block\d+/attn/qkv/(kernel|bias)$")
_SAM_PROJ = re.compile(r"block\d+/attn/proj/kernel$")
_SAM_LIN1 = re.compile(r"block\d+/lin1/(kernel|bias)$")
_SAM_LIN2 = re.compile(r"block\d+/lin2/kernel$")


def sam_tp_spec(path: str, shape: Tuple[int, ...], axis: str = "model") -> Optional[P]:
    """Megatron split for the SAM ViT encoder layout (models/sam_encoder.py:
    block{i}/attn/{qkv,proj} + lin1/lin2 MLP).

    The packed qkv projection is column-sharded on its (3*C) output axis;
    the C-sized q/k/v segments are not interleaved per device, so SPMD
    inserts a reshard at the (3, heads, head_dim) reshape — correct by SPMD
    semantics, with one extra collective vs an interleaved packing (a
    converted pretrained checkpoint keeps torch's packing, so we keep the
    layout and pay the reshard).
    """
    if _SAM_QKV.search(path):
        return P(None, axis) if len(shape) == 2 else P(axis)
    if _SAM_PROJ.search(path) and len(shape) == 2:
        return P(axis, None)
    if _SAM_LIN1.search(path):
        return P(None, axis) if len(shape) == 2 else P(axis)
    if _SAM_LIN2.search(path) and len(shape) == 2:
        return P(axis, None)
    return None


def _path_str(path) -> str:
    parts = []
    for k in path:
        key = getattr(k, "key", None)
        if key is None:
            key = getattr(k, "idx", None)
        parts.append(str(key))
    return "/".join(parts)


def shard_params_tp(
    tree: Any,
    mesh: Mesh,
    spec_fn: SpecFn = vit_tp_spec,
    axis_name: str = "model",
) -> Any:
    """Place a parameter pytree with TP shardings from `spec_fn`;
    unmatched leaves are replicated. Raises if a matched dimension is not
    divisible by the model-axis size."""
    n = mesh.shape[axis_name]
    rep = NamedSharding(mesh, P())

    def place(path, x):
        p = _path_str(path)
        spec = spec_fn(p, np.shape(x))
        if spec is None:
            return jax.device_put(x, rep)
        for d, s in enumerate(spec):
            if s is not None and np.shape(x)[d] % n != 0:
                raise ValueError(
                    f"TP: {p} dim {d} ({np.shape(x)[d]}) not divisible by "
                    f"model axis size {n}"
                )
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, tree)


# Matrix-shaped leaves inside these module families are expected to carry
# a model-axis spec; a rename that silently demotes them to replicated is
# the TP-coverage failure mode this check exists for.
_TP_FAMILY = re.compile(
    r"(EncoderBlock_\d+|MultiHeadDotProductAttention_\d+|block\d+/(attn|lin[12]))"
)
# 2-D+ leaves inside the families that are replicated BY DESIGN
_TP_REPLICATED_OK = re.compile(r"rel_pos")


def check_tp_coverage(tree: Any, spec_fn: SpecFn = vit_tp_spec) -> list:
    """Assert the TP ruleset actually covered the transformer trunk.

    Round-4 verdict item 6: `shard_params_tp` silently replicates
    unmatched leaves, so a renamed module quietly loses its sharding.
    This walks the tree and raises if (a) no leaf matched any rule at
    all (wrong spec_fn / renamed block family), or (b) a matrix-shaped
    leaf inside a known transformer-block family got no spec (renamed
    sublayer). Returns the matched paths for logging.
    """
    matched, missed = [], []

    def visit(path, x):
        p = _path_str(path)
        spec = spec_fn(p, np.shape(x))
        if spec is not None:
            matched.append(p)
        elif (
            _TP_FAMILY.search(p)
            and len(np.shape(x)) >= 2
            and not _TP_REPLICATED_OK.search(p)
        ):
            missed.append(p)
        return x

    jax.tree_util.tree_map_with_path(visit, tree)
    if not matched:
        raise ValueError(
            "TP coverage: no parameter leaf matched any sharding rule — "
            "wrong spec_fn for this parameter tree?"
        )
    if missed:
        raise ValueError(
            "TP coverage: matrix leaves inside transformer blocks got no "
            f"sharding spec (renamed sublayer?): {missed[:8]}"
        )
    return matched


def shard_state_tp(
    state: Any,
    mesh: Mesh,
    spec_fn: SpecFn = vit_tp_spec,
    axis_name: str = "model",
) -> Any:
    """Shard a TrainState for TP: params and optimizer moments by the TP
    rules (moments share leaf paths under their optax wrapper, so the
    path regexes match inside them too), batch_stats and scalars
    replicated."""
    rep = NamedSharding(mesh, P())
    return state.replace(
        params=shard_params_tp(state.params, mesh, spec_fn, axis_name),
        opt_state=shard_params_tp(state.opt_state, mesh, spec_fn, axis_name),
        batch_stats=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), state.batch_stats
        ),
        step=jax.device_put(state.step, rep),
    )
