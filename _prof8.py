import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from equiadapt_tpu.ops.pallas.select_warp import rotate_select

B, H, G, C = 256, 224, 8, 16
ITERS = 10
rng = np.random.default_rng(0)
y32 = jnp.asarray(rng.normal(size=(B, H, H, C)).astype(np.float32))

def timed(fn, *args):
    f = jax.jit(fn)
    s = f(*args, jnp.float32(0.0)); float(s)
    s = f(*args, s*0.0); float(s)
    t0 = time.perf_counter()
    for k in range(ITERS):
        s = f(*args, s*1e-30 + jnp.float32(k))
    float(s)
    return (time.perf_counter() - t0) / ITERS * 1e3

def mk(idx_val):
    idx = jnp.full((B,), idx_val, jnp.int32)
    def f(y, i):
        yb = (y + i*1e-9).astype(jnp.bfloat16)
        out = rotate_select(yb, idx, G, 1.0, "zeros", "fast")
        return jnp.sum(out.astype(jnp.float32))
    return f

def base(y, i):
    yb = (y + i*1e-9).astype(jnp.bfloat16)
    return jnp.sum(yb.astype(jnp.float32))

print("baseline", round(timed(base, y32), 2), flush=True)
for g, label in [(0, "k0 copy"), (4, "k2 two-matmul"), (2, "k1 transpose"), (1, "odd 45deg")]:
    print(f"idx={g} ({label})", round(timed(mk(g), y32), 2), flush=True)
