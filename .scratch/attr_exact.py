"""Attribution: fp32-exact canonicalize-only; plus HIGH-precision rot90 check."""
import os, sys, time
os.environ.setdefault("EQUIADAPT_NCHW_SPINE", "never")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

from equiadapt_tpu.images import EquivariantNetwork, GroupEquivariantImageCanonicalization
from equiadapt_tpu.utils.profiling import profile_trace, device_op_attribution

IMAGE, NUM_ROT, BATCH = 224, 8, 256
N_LOOP = 12

net = EquivariantNetwork(
    in_channels=3, out_channels=8, kernel_size=3, group_type="rotation",
    num_rotations=NUM_ROT, num_layers=2, fused_pool_lift=True)
canon = GroupEquivariantImageCanonicalization(
    canonicalization_network=net, in_shape=(IMAGE, IMAGE, 3),
    input_crop_ratio=1.0, resize_shape=56, num_rotations=NUM_ROT,
    group_type="rotation", warp_mode="exact")

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(BATCH, IMAGE, IMAGE, 3)).astype(np.float32))
small = jnp.zeros((2, IMAGE, IMAGE, 3), jnp.float32)
cp = jax.jit(lambda k, s: canon.init(k, s, training=False))(jax.random.key(0), small)

def pool2(a, eps=1e-6):
    return jnp.stack([a, a + jnp.asarray(eps, a.dtype)])

def pick(p, slot):
    return lax.dynamic_index_in_dim(p, slot, axis=0, keepdims=False)

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
float(f(jnp.float32(0.0), cp, xp2))
t0 = time.perf_counter(); float(f(jnp.float32(0.0), cp, xp2))
print(f"canon-only fp32-exact: {(time.perf_counter()-t0)/N_LOOP*1e3:.3f} ms/iter")
with profile_trace("/tmp/attr_exact"):
    float(f(jnp.float32(0.0), cp, xp2))
rows = device_op_attribution("/tmp/attr_exact", top=16)
for name, ms in rows:
    print(f"{ms/N_LOOP:8.4f} ms  {name[:90]}")

# HIGH-precision fp32 rot90 exactness + speed
H = 224
ex = (jax.lax.broadcasted_iota(jnp.int32, (H, H), 0)
      + jax.lax.broadcasted_iota(jnp.int32, (H, H), 1) == H - 1).astype(jnp.float32)
plane = jnp.asarray(rng.normal(size=(H, H)).astype(np.float32))
for prec in ("highest", "high", "default"):
    o = jax.jit(lambda e, p: jax.lax.dot_general(
        e, p, (((1,), (0,)), ((), ())), precision=prec,
        preferred_element_type=jnp.float32))(ex, plane)
    exact = bool((o == plane[::-1]).all())
    print(f"fp32 exchange-matmul precision={prec}: bitexact={exact}")
