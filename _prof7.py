import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from equiadapt_tpu.ops.group_action import get_action_on_image_features, roll_by_gather
from equiadapt_tpu.ops.pallas.select_warp import rotate_select

B, H, G, C = 256, 224, 8, 16
ITERS = 10
rng = np.random.default_rng(0)
y32 = jnp.asarray(rng.normal(size=(B, H, H, C)).astype(np.float32))
deg = jnp.asarray((rng.integers(0, G, B) * 45.0).astype(np.float32))
idx = jnp.mod(jnp.round(deg / 45.0).astype(jnp.int32), G)

def timed(fn, *args):
    f = jax.jit(fn)
    s = f(*args, jnp.float32(0.0)); float(s)
    s = f(*args, s*0.0); float(s)
    t0 = time.perf_counter()
    for k in range(ITERS):
        s = f(*args, s*1e-30 + jnp.float32(k))
    float(s)
    return (time.perf_counter() - t0) / ITERS * 1e3

def full(y, i):
    yb = (y + i*1e-9).astype(jnp.bfloat16)
    out = get_action_on_image_features(
        yb, num_rotations=G, num_group=G, rotation_deg=deg,
        induced_rep_type="regular", mode="fast")
    return jnp.sum(out.astype(jnp.float32))

def rot_only(y, i):
    yb = (y + i*1e-9).astype(jnp.bfloat16)
    out = rotate_select(yb, idx, G, 1.0, "zeros", "fast")
    return jnp.sum(out.astype(jnp.float32))

def roll_only(y, i):
    yb = (y + i*1e-9).astype(jnp.bfloat16)
    ym = yb.reshape(B, H, H, C // G, G)
    out = roll_by_gather(ym, deg / 360.0 * G)
    return jnp.sum(out.astype(jnp.float32))

def cast_only(y, i):
    yb = (y + i*1e-9).astype(jnp.bfloat16)
    return jnp.sum(yb.astype(jnp.float32))

for name, fn in [("cast_only", cast_only), ("rot_only", rot_only),
                 ("roll_only", roll_only), ("full_invert", full),
                 ("cast_only2", cast_only), ("rot_only2", rot_only),
                 ("full_invert2", full)]:
    print(name, round(timed(fn, y32), 2), flush=True)
