"""Round-4: per-op attribution of wrapped-vs-bare at the bench config."""
import sys, shutil
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, "/root/repo")
from equiadapt_tpu.images import EquivariantNetwork, GroupEquivariantImageCanonicalization
from equiadapt_tpu.models import ResNet50
from equiadapt_tpu.utils.profiling import profile_trace, device_op_attribution

IMAGE, NUM_ROT, BATCH = 224, 8, 256

net_pooled = EquivariantNetwork(
    in_channels=3, out_channels=8, kernel_size=3, group_type="rotation",
    num_rotations=NUM_ROT, num_layers=2, fused_pool_lift=True)
canon = GroupEquivariantImageCanonicalization(
    canonicalization_network=net_pooled, in_shape=(IMAGE, IMAGE, 3),
    input_crop_ratio=1.0, resize_shape=56, num_rotations=NUM_ROT,
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

for f, args in [(wrapped, (cp, rp, x)), (bare, (rp, x))]:
    float(f(*args))

results = {}
for name, f, args in [("wrapped", wrapped, (cp, rp, x)), ("bare", bare, (rp, x))]:
    d = f"/tmp/eqt_attr16_{name}"
    shutil.rmtree(d, ignore_errors=True)
    for _ in range(3):
        float(f(*args))
    with profile_trace(d):
        for _ in range(16):
            float(f(*args))
    rows = device_op_attribution(d, top=200)
    results[name] = rows
    tot = sum(ms for _, ms in rows)
    print(f"=== {name}: total {tot/16:.3f} ms/iter ===")
    for nm, ms in rows[:35]:
        print(f"{ms/16:8.4f} ms  {nm[:110]}")
print()
# diff: ops only in wrapped (the overhead ops)
bare_names = {nm for nm, _ in results["bare"]}
extra = [(nm, ms) for nm, ms in results["wrapped"] if nm not in bare_names]
print(f"=== wrapped-only ops: {sum(ms for _, ms in extra)/16:.3f} ms/iter ===")
for nm, ms in extra[:45]:
    print(f"{ms/16:8.4f} ms  {nm[:110]}")
