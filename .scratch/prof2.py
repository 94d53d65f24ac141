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

float(wrapped(cp, rp, x))
for _ in range(3): float(wrapped(cp, rp, x))
d = "/tmp/eqt_prof_w4"; shutil.rmtree(d, ignore_errors=True)
with profile_trace(d):
    for _ in range(8): float(wrapped(cp, rp, x))
import json
rows = [(n, ms/8) for n, ms in device_op_attribution(d, top=400)]
json.dump(rows, open("/tmp/attrib_w4.json","w"))
print("total:", sum(ms for _, ms in rows))
