import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

B, H, W, C = 256, 224, 224, 3
rng = np.random.default_rng(0)
x_f32 = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
N_LOOP = 24

def pool2(a, eps=1e-6):
    return jnp.stack([a, a + eps])

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

from equiadapt_tpu.ops.warp import _twopass_matrices, rotate_twopass_from_nchw

xp = pool2(x_f32)
xn16 = pool2(jnp.moveaxis(x_f32, -1, 1).astype(jnp.bfloat16))

def null_f32(xps, slot):
    xx = pick(xps, slot)
    return xx[0, 0, 0, 0].astype(jnp.float32) * 1e-6

def null_sum16(xps, slot):   # sum cost reference on bf16 NCHW
    return jnp.sum(pick(xps, slot).astype(jnp.float32))

def prep(xps, slot):
    xn = jnp.moveaxis(pick(xps, slot), -1, 1).astype(jnp.bfloat16)
    return jnp.sum(xn.astype(jnp.float32))

def tp(xps, slot):
    out = rotate_twopass_from_nchw(pick(xps, slot), 45.0, "border")
    return jnp.sum(out.astype(jnp.float32))

def tp_swapped(xps, slot):
    xn = pick(xps, slot); dt = xn.dtype
    M1, M2 = _twopass_matrices(H, W, 45.0, "border", dt)
    V = jnp.einsum("bchw,yhw->bcyw", xn, M1, preferred_element_type=jnp.float32)
    out = jnp.einsum("bcyw,ywx->bcyx", V.astype(dt), M2, preferred_element_type=jnp.float32).astype(dt)
    return jnp.sum(out.astype(jnp.float32))

def tp_dotgen(xps, slot):
    xn = pick(xps, slot); dt = xn.dtype
    M1, M2 = _twopass_matrices(H, W, 45.0, "border", dt)
    V = jnp.einsum("yhw,bchw->bcyw", M1, xn, preferred_element_type=jnp.float32).astype(dt)
    Vt = jnp.moveaxis(V, 2, 0)
    o = lax.dot_general(Vt.reshape(H, B*C, W), M2, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
    out = jnp.moveaxis(o.reshape(H, B, C, W).astype(dt), 0, 2)
    return jnp.sum(out.astype(jnp.float32))

print("null_f32 pick      ", timed_ms(null_f32, xp))
print("null sum16 (nchw)  ", timed_ms(null_sum16, xn16))
print("prep (conv+T+sum)  ", timed_ms(prep, xp))
print("tp_current  +sum   ", timed_ms(tp, xn16))
print("tp_swapped  +sum   ", timed_ms(tp_swapped, xn16))
print("tp_dotgen   +sum   ", timed_ms(tp_dotgen, xn16))
