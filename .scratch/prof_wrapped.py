"""Round-4 phase 1: per-op attribution of the wrapped serving step."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, "/root/repo")
from equiadapt_tpu.images import EquivariantNetwork, GroupEquivariantImageCanonicalization
from equiadapt_tpu.models import ResNet50
from equiadapt_tpu.utils.profiling import profile_trace, device_op_attribution

IMAGE, NUM_ROT, BATCH, RESIZE, CROP = 224, 8, 256, 64, 0.9

net_pooled = EquivariantNetwork(
    in_channels=3, out_channels=8, kernel_size=3, group_type="rotation",
    num_rotations=NUM_ROT, num_layers=2, fused_pool_lift=True)
canon = GroupEquivariantImageCanonicalization(
    canonicalization_network=net_pooled, in_shape=(IMAGE, IMAGE, 3),
    input_crop_ratio=CROP, resize_shape=RESIZE, num_rotations=NUM_ROT,
    group_type="rotation", warp_mode="fast", compute_dtype=jnp.bfloat16,
    output_dtype="compute")
resnet = ResNet50(num_classes=10, small_images=False, dtype=jnp.bfloat16)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(BATCH, IMAGE, IMAGE, 3)).astype(np.float32))
small = jnp.zeros((2, IMAGE, IMAGE, 3), jnp.float32)
cp = jax.jit(lambda k, s: canon.init(k, s, training=False))(jax.random.key(0), small)
rp = jax.jit(lambda k, s: resnet.init(k, s, training=False))(jax.random.key(1), small)
rp = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, rp)

@jax.jit
def wrapped(cp, rp, xx):
    x_c, _ = canon.apply(cp, xx, training=False)
    return jnp.sum(resnet.apply(rp, x_c, training=False).astype(jnp.float32))

@jax.jit
def bare(rp, xx):
    return jnp.sum(resnet.apply(rp, xx, training=False).astype(jnp.float32))

@jax.jit
def canon_only(cp, xx):
    x_c, _ = canon.apply(cp, xx, training=False)
    return jnp.sum(x_c.astype(jnp.float32))

for f, args in [(wrapped, (cp, rp, x)), (bare, (rp, x)), (canon_only, (cp, x))]:
    float(f(*args))  # compile

import shutil
for name, f, args in [("wrapped", wrapped, (cp, rp, x)), ("bare", bare, (rp, x))]:
    d = f"/tmp/eqt_prof_{name}"
    shutil.rmtree(d, ignore_errors=True)
    # warm
    for _ in range(3): float(f(*args))
    with profile_trace(d):
        for _ in range(8):
            float(f(*args))
    rows = device_op_attribution(d, top=60)
    tot = sum(ms for _, ms in rows)
    print(f"==== {name}: total listed {tot/8:.3f} ms/step ====")
    for opname, ms in rows:
        if ms/8 < 0.008: continue
        print(f"{ms/8:8.4f} ms  {opname}")
