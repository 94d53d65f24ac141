import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

B, H, W, C = 256, 224, 224, 3
NUM_ROT = 8
rng = np.random.default_rng(0)
N_LOOP = 24

def pool2(a, eps=1e-6):
    return jnp.stack([a, a + jnp.asarray(eps, a.dtype)])

def pick(p, slot):
    return lax.dynamic_index_in_dim(p, slot, axis=0, keepdims=False)

def timed_ms(fn, *args, reps=3):
    def run(seed, *a):
        def body(it, s):
            slot = (it + jnp.asarray(s * 0.0, jnp.int32)) % 2
            return fn(*a, slot) * 1e-6 + s * 1e-30
        return lax.fori_loop(0, N_LOOP, body, seed)
    f = jax.jit(run)
    s = f(jnp.float32(0.0), *args); float(s)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); s = f(s * 0.0, *args); float(s)
        best = min(best, (time.perf_counter() - t0) / N_LOOP * 1e3)
    return best

from equiadapt_tpu.ops.pallas.select_warp import (
    pallas_rotate_select_nchw, rotate_roll_select, _blend_ref,
)
from equiadapt_tpu.ops.warp import rotate_select_fast

xn16 = jnp.moveaxis(
    jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)), -1, 1
).astype(jnp.bfloat16)
idx = jnp.asarray(rng.integers(0, NUM_ROT, size=(B,)).astype(np.int32))
xnp = pool2(xn16)

def sel_nchw(xps, ii, slot):
    out = pallas_rotate_select_nchw(pick(xps, slot), ii, NUM_ROT, -1.0, "border", mode="fast")
    return jnp.sum(out.astype(jnp.float32))

def null16(xps, ii, slot):
    return jnp.sum(pick(xps, slot).astype(jnp.float32))

print("null sum(nchw bf16)     ", timed_ms(null16, xnp, idx))
print("select C8 fast (steered)", timed_ms(sel_nchw, xnp, idx))

# fused invert at C=16 bf16
y16 = jnp.asarray(rng.normal(size=(B, H, W, 16)).astype(np.float32)).astype(jnp.bfloat16)
yp = pool2(y16)
def inv_fused(yps, ii, slot):
    out = rotate_roll_select(pick(yps, slot), ii, ii, NUM_ROT, 1.0, "zeros")
    return jnp.sum(out.astype(jnp.float32))
def null_y(yps, ii, slot):
    return jnp.sum(pick(yps, slot).astype(jnp.float32))
print("null sum(y16)           ", timed_ms(null_y, yp, idx))
print("invert fused (steered)  ", timed_ms(inv_fused, yp, idx))

# correctness on hardware: steered select == blend
xs = jnp.asarray(rng.normal(size=(8, 64, 64, 3)).astype(np.float32))
i8 = jnp.asarray(rng.integers(0, NUM_ROT, size=(8,)).astype(np.int32))
from equiadapt_tpu.ops.pallas.select_warp import rotate_select
a = rotate_select(xs, i8, NUM_ROT, -1.0, "border")
bref = _blend_ref(xs, i8, NUM_ROT, -1.0, "border")
print("exact select bitexact:", bool((a == bref).all()))
af = rotate_select(xs, i8, NUM_ROT, -1.0, "border", "fast")
bf = rotate_select_fast(xs, i8, NUM_ROT, -1.0, "border")
print("fast select bitexact:", bool((af == bf).all()))
