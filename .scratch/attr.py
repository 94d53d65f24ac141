"""Device-op attribution of the CURRENT wrapped step (committed path)."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

from equiadapt_tpu.images import EquivariantNetwork, GroupEquivariantImageCanonicalization
from equiadapt_tpu.models import ResNet50
from equiadapt_tpu.utils.profiling import profile_trace, device_op_attribution

IMAGE, NUM_ROT, BATCH = 224, 8, 256
N_LOOP = 24

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

def pool2(a, eps=1e-6):
    return jnp.stack([a, a + jnp.asarray(eps, a.dtype)])

def pick(p, slot):
    return lax.dynamic_index_in_dim(p, slot, axis=0, keepdims=False)

def wrapped(cps, rps, xps, slot):
    x_c, _ = canon.apply(cps, pick(xps, slot), training=False)
    return jnp.sum(resnet.apply(rps, x_c, training=False).astype(jnp.float32))

def canon_only(cps, xps, slot):
    x_c, _ = canon.apply(cps, pick(xps, slot), training=False)
    return jnp.sum(x_c.astype(jnp.float32))

def run_of(fn, *args):
    def run(seed, *a):
        def body(it, s):
            slot = (it + jnp.asarray(s * 0.0, jnp.int32)) % 2
            return fn(*a, slot) * 1e-6 + s * 1e-30
        return lax.fori_loop(0, N_LOOP, body, seed)
    return jax.jit(run)

xp2 = pool2(x)
f = run_of(canon_only, cp, xp2)
s = f(jnp.float32(0.0), cp, xp2) if False else f(jnp.float32(0.0), cp, xp2)
float(s)
with profile_trace("/tmp/attr_canon"):
    float(f(jnp.float32(0.0), cp, xp2))
rows = device_op_attribution("/tmp/attr_canon", top=28)
print("=== canonicalize-only step (x N_LOOP; divide by", N_LOOP, ") ===")
tot = 0.0
for name, ms in rows:
    tot += ms
    print(f"{ms/N_LOOP:8.4f} ms  {name[:100]}")
print(f"TOTAL listed: {tot/N_LOOP:.4f} ms/iter")
