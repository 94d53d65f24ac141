import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from equiadapt_tpu.ops.pallas.select_warp import _pallas_select2
from equiadapt_tpu.ops.warp import rotate_twopass_nchw

B, H, G, C = 256, 224, 8, 16
ITERS = 10
rng = np.random.default_rng(0)
y32 = jnp.asarray(rng.normal(size=(B, H, H, C)).astype(np.float32))
yn32 = jnp.asarray(rng.normal(size=(B, C, H, H)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, G, B).astype(np.int32))
src = idx % 2
kk = idx // 2

def timed(fn, *args):
    f = jax.jit(fn)
    s = f(*args, jnp.float32(0.0)); float(s)
    s = f(*args, s*0.0); float(s)
    t0 = time.perf_counter()
    for k in range(ITERS):
        s = f(*args, s*1e-30 + jnp.float32(k))
    float(s)
    return (time.perf_counter() - t0) / ITERS * 1e3

def base_nchw(y, i):
    yb = (y + i*1e-9).astype(jnp.bfloat16)
    return jnp.sum(yb.astype(jnp.float32))

def tp_only(y, i):
    yb = (y + i*1e-9).astype(jnp.bfloat16)
    return jnp.sum(rotate_twopass_nchw(yb, 45.0, "zeros").astype(jnp.float32))

def mova_only(y, i):
    yb = (y + i*1e-9).astype(jnp.bfloat16)
    return jnp.sum(jnp.moveaxis(yb, -1, 1).astype(jnp.float32))

def kernel_only(yn, i):
    yb = (yn + i*1e-9).astype(jnp.bfloat16)
    out = _pallas_select2(yb, yb, src, kk)
    return jnp.sum(out.astype(jnp.float32))

print("base(nhwc read)", round(timed(base_nchw, y32), 2), flush=True)
print("twopass_nchw", round(timed(tp_only, y32), 2), flush=True)
print("moveaxis", round(timed(mova_only, y32), 2), flush=True)
print("base(nchw read)", round(timed(base_nchw, yn32), 2), flush=True)
print("kernel_only", round(timed(kernel_only, yn32), 2), flush=True)
