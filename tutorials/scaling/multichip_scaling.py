"""Tutorial 5 — Scaling canonicalization pipelines across a TPU mesh.

No reference counterpart (the reference's only distribution is Lightning
DDP, train_utils.py:83-92); this walks the TPU-native scale-out surface:

1. DP    — one jit over a 1-D "data" mesh; XLA inserts the gradient psum.
2. FSDP  — ZeRO-style parameter/moment sharding on the same axis.
3. TP    — Megatron column/row splits of a ViT over a (data, model) mesh.
4. PP    — GPipe pipeline of the ViT trunk over a "stage" mesh.
5. GP    — group-parallel: the |G| orbit axis of the per-element
           robustness sweep sharded over a (data, group) mesh.

Runs on any machine: with no TPUs it provisions an 8-device virtual CPU
mesh (the standard JAX SPMD testing recipe); on a real slice delete the
virtual-mesh block and the same code spans the chips.

Run:  PYTHONPATH=. python tutorials/scaling/multichip_scaling.py
"""

import os

# --- virtual 8-device mesh (remove this block on a real TPU slice) --------
# set (not setdefault): some environments pre-pin JAX_PLATFORMS to a
# single-chip backend via sitecustomize, which would defeat the virtual mesh
N_DEV = 8
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={N_DEV}"
).strip()

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_platforms", "cpu")

from equiadapt_tpu.data import synthetic_image_batch
from equiadapt_tpu.models import ResNet18, ViT
from equiadapt_tpu.parallel import (
    data_parallel_jit,
    group_sharded_inference,
    make_mesh,
    make_mesh_2d,
    make_mesh_group,
    make_mesh_stage,
    replicate,
    shard_batch,
    shard_state_fsdp,
    shard_state_tp,
    vit_pipeline_apply,
)
from equiadapt_tpu.pipelines import (
    ImageClassifierPipeline,
    create_train_state,
    make_train_step,
)
from equiadapt_tpu.utils import (
    CanonicalizationConfig,
    NetworkHyperparams,
    get_image_canonicalization_network,
    get_image_canonicalizer,
)

assert jax.device_count() >= N_DEV, jax.devices()

# --- the pipeline under test: C4 GCNN canonicalizer + ResNet-18 -----------
cfg = CanonicalizationConfig(
    canonicalization_type="group_equivariant",
    network_type="e2cnn",
    network_hyperparams=NetworkHyperparams(
        kernel_size=3, out_channels=8, num_layers=2, num_rotations=4
    ),
    input_crop_ratio=0.9,
    resize_shape=16,
)
in_shape = (32, 32, 3)
canon = get_image_canonicalizer(
    cfg, get_image_canonicalization_network(cfg, in_shape), in_shape
)
pipeline = ImageClassifierPipeline(
    canonicalizer=canon,
    prediction_network=ResNet18(num_classes=10, small_images=True),
)
batch = synthetic_image_batch(jax.random.key(0), 2 * N_DEV, size=32)
tx = optax.adamw(1e-3)
step = make_train_step({"prior_weight": 1.0}, jit=False)

# --- 1. DP: replicate state, shard the batch ------------------------------
mesh = make_mesh(N_DEV)
state = create_train_state(pipeline, jax.random.key(1), batch["image"], tx)
dp_step = data_parallel_jit(step, mesh, num_extra_args=1)
state_dp, metrics = dp_step(
    replicate(state, mesh), shard_batch(batch, mesh), jax.random.key(2)
)
print(f"DP   loss={float(metrics['loss/total']):.4f}")

# --- 2. FSDP: shard parameters + optimizer moments on the data axis -------
state_f = shard_state_fsdp(
    create_train_state(pipeline, jax.random.key(3), batch["image"], tx),
    mesh, min_shard_bytes=1 << 10,
)
state_f, metrics = jax.jit(step, donate_argnums=0)(
    state_f, shard_batch(batch, mesh), jax.random.key(4)
)
print(f"FSDP loss={float(metrics['loss/total']):.4f}")

# --- 3. TP: ViT attention/MLP sharded over a (data, model) mesh -----------
vit = ViT(num_classes=10, patch_size=4, hidden_dim=16, num_layers=2,
          num_heads=4, mlp_dim=32)
pipe_tp = ImageClassifierPipeline(canonicalizer=canon, prediction_network=vit)
mesh2 = make_mesh_2d(N_DEV // 4, 4)
state_t = shard_state_tp(
    replicate(
        create_train_state(pipe_tp, jax.random.key(5), batch["image"], tx),
        mesh2,
    ),
    mesh2,
)
with mesh2:
    state_t, metrics = jax.jit(step, donate_argnums=0)(
        state_t, shard_batch(batch, mesh2), jax.random.key(6)
    )
print(f"TP   loss={float(metrics['loss/total']):.4f}")

# --- 4. PP: pipeline the ViT trunk over 4 stages --------------------------
vit_pp = ViT(num_classes=10, patch_size=4, hidden_dim=16, num_layers=8,
             num_heads=4, mlp_dim=32)
xs = batch["image"][:8, :16, :16, :]
vars_pp = vit_pp.init(jax.random.key(7), xs, training=False)
mesh_s = make_mesh_stage(4)
logits_pp = vit_pipeline_apply(vit_pp, vars_pp, xs, mesh_s, num_microbatches=4)
ref = vit_pp.apply(vars_pp, xs, training=False)
assert float(jnp.abs(logits_pp - ref).max()) < 1e-4
print(f"PP   max|pipeline - sequential| = {float(jnp.abs(logits_pp - ref).max()):.2e}")

# --- 5. GP: shard the |G| robustness sweep over a (data, group) mesh ------
mesh_g = make_mesh_group(N_DEV // 4, 4)
gm = group_sharded_inference(state_dp, batch, mesh_g, num_rotations=4)
print(f"GP   group_acc={float(gm['test/group_acc']):.4f}")

print("all five regimes ran on the", jax.default_backend(), "mesh")
