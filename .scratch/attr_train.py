"""Device-op attribution of the full bf16-fast train step (verdict item 3)."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

import optax
from equiadapt_tpu.images import EquivariantNetwork, GroupEquivariantImageCanonicalization
from equiadapt_tpu.models import ResNet50
from equiadapt_tpu.pipelines import ImageClassifierPipeline
from equiadapt_tpu.pipelines.classification import TrainState, make_train_step
from equiadapt_tpu.utils.profiling import profile_trace, device_op_attribution

IMAGE, NUM_ROT, BT = 224, 8, 128
N_LOOP = 6

net = EquivariantNetwork(
    in_channels=3, out_channels=8, kernel_size=3, group_type="rotation",
    num_rotations=NUM_ROT, num_layers=2, fused_pool_lift=True)
canon = GroupEquivariantImageCanonicalization(
    canonicalization_network=net, in_shape=(IMAGE, IMAGE, 3),
    input_crop_ratio=1.0, resize_shape=56, num_rotations=NUM_ROT,
    group_type="rotation", warp_mode="fast", compute_dtype=jnp.bfloat16,
    output_dtype="compute")
resnet = ResNet50(num_classes=10, small_images=False, dtype=jnp.bfloat16)
pipe = ImageClassifierPipeline(canonicalizer=canon, prediction_network=resnet)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(BT, IMAGE, IMAGE, 3)).astype(np.float32))
labels = jnp.asarray(rng.integers(0, 10, size=(BT,)), dtype=jnp.int32)
variables = jax.jit(pipe.init, static_argnames="training")(
    {"params": jax.random.key(7), "dropout": jax.random.key(8)}, x[:2],
    training=True)
tx = optax.adamw(1e-3)
state = TrainState(
    step=jnp.zeros((), jnp.int32), params=variables["params"],
    batch_stats=variables.get("batch_stats", {}), tx=tx,
    opt_state=tx.init(variables["params"]), apply_fn=pipe.apply)
step = make_train_step({"prior_weight": 100.0}, jit=False)

def pool2(a, eps=1e-6):
    return jnp.stack([a, a + jnp.asarray(eps, a.dtype)])

xp2 = pool2(x)

def run(st, xps, yy):
    def body(it, s):
        s2, _ = step(s, {"image": lax.dynamic_index_in_dim(xps, it % 2, 0, False),
                          "label": yy}, jax.random.key(0))
        return s2
    return lax.fori_loop(0, N_LOOP, body, st)

f = jax.jit(run)
st = f(state, xp2, labels)
float(jax.tree_util.tree_leaves(st.params)[0].sum())
t0 = time.perf_counter()
st = f(st, xp2, labels)
float(jax.tree_util.tree_leaves(st.params)[0].sum())
ms = (time.perf_counter() - t0) / N_LOOP * 1e3
print(f"train step: {ms:.2f} ms/step @ batch {BT}")
with profile_trace("/tmp/attr_train"):
    st = f(st, xp2, labels)
    float(jax.tree_util.tree_leaves(st.params)[0].sum())
rows = device_op_attribution("/tmp/attr_train", top=40)
tot = 0.0
for name, msr in rows:
    per = msr / N_LOOP
    tot += per
    if per > 0.15:
        print(f"{per:8.3f} ms  {name[:110]}")
print(f"(listed ops total {tot:.2f} ms/step)")
