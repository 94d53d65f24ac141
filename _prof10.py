import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from equiadapt_tpu.ops.pallas.select_warp import _pallas_select, _pallas_select2

B, H, G, C = 256, 224, 8, 16
ITERS = 10
rng = np.random.default_rng(0)
yn = jnp.asarray(rng.normal(size=(B, C, H, H)).astype(np.float32)).astype(jnp.bfloat16)
src = jnp.asarray((rng.integers(0, 8, B) % 2).astype(np.int32))
kk = jnp.asarray((rng.integers(0, 4, B)).astype(np.int32))
k0 = jnp.zeros((B,), jnp.int32)

def timed(fn, *args):
    f = jax.jit(fn)
    s = f(*args, jnp.float32(0.0)); float(s)
    s = f(*args, s*0.0); float(s)
    t0 = time.perf_counter()
    for k in range(ITERS):
        s = f(*args, s*1e-30 + jnp.float32(k))
    float(s)
    return (time.perf_counter() - t0) / ITERS * 1e3

def base(y, i):
    return jnp.sum((y + i.astype(jnp.bfloat16)*1e-9).astype(jnp.float32))

def two_in(y, i):
    yb = y + i.astype(jnp.bfloat16)*1e-9
    return jnp.sum(_pallas_select2(yb, yb, src, kk).astype(jnp.float32))

def one_in(y, i):
    yb = y + i.astype(jnp.bfloat16)*1e-9
    return jnp.sum(_pallas_select(yb[None], jnp.zeros_like(src), kk).astype(jnp.float32))

def two_in_k0(y, i):
    yb = y + i.astype(jnp.bfloat16)*1e-9
    return jnp.sum(_pallas_select2(yb, yb, src, k0).astype(jnp.float32))

print("base", round(timed(base, yn), 2), flush=True)
print("two_in", round(timed(two_in, yn), 2), flush=True)
print("one_in", round(timed(one_in, yn), 2), flush=True)
print("two_in_k0", round(timed(two_in_k0, yn), 2), flush=True)
print("base2", round(timed(base, yn), 2), flush=True)
print("one_in2", round(timed(one_in, yn), 2), flush=True)
