import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from equiadapt_tpu.ops.group_action import get_action_on_image_features, roll_by_gather
from equiadapt_tpu.ops.pallas.select_warp import rotate_roll_select
from equiadapt_tpu.ops.warp import rotate_select_fast

B, H, G, C = 256, 224, 8, 16
rng = np.random.default_rng(0)

# small-shape bit check first
xs = jnp.asarray(rng.normal(size=(8, 64, 64, 16)).astype(np.float32)).astype(jnp.bfloat16)
idx = jnp.asarray(rng.integers(0, 8, 8).astype(np.int32))
sh = idx
t0 = time.time()
fused = rotate_roll_select(xs, idx, sh, 8, 1.0, "zeros")
fused.block_until_ready()
print(f"small compile+run {time.time()-t0:.0f}s", flush=True)
ref = rotate_select_fast(xs, idx, 8, 1.0, "zeros")
ref = roll_by_gather(ref.reshape(8, 64, 64, 2, 8), sh.astype(jnp.float32)).reshape(8, 64, 64, 16)
print("small bitexact:", bool((fused == ref).all()), flush=True)

# big shape: the bench invert config
y32 = jnp.asarray(rng.normal(size=(B, H, H, C)).astype(np.float32))
deg = jnp.asarray((rng.integers(0, G, B) * 45.0).astype(np.float32))

def full(y, i):
    yb = (y + i * 1e-9).astype(jnp.bfloat16)
    out = get_action_on_image_features(
        yb, num_rotations=G, num_group=G, rotation_deg=deg,
        induced_rep_type="regular", mode="fast")
    return jnp.sum(out.astype(jnp.float32))

t0 = time.time()
f = jax.jit(full)
s = f(y32, jnp.float32(0.0)); float(s)
print(f"big compile {time.time()-t0:.0f}s", flush=True)
for _ in range(2):
    s = f(y32, s * 0.0); float(s)
ITERS = 10
t0 = time.perf_counter()
for k in range(ITERS):
    s = f(y32, s * 1e-30 + jnp.float32(k))
float(s)
print(f"full_invert(fused) {(time.perf_counter()-t0)/ITERS*1e3:.2f} ms", flush=True)
print("DONE", flush=True)
