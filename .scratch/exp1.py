"""Round-4 micro-experiments: twopass formulations, input-prep, fp32 matmul cost."""
import sys, time, functools
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

def timed_ms(fn, *args, reps=3):
    def run(seed, *a):
        def body(it, s):
            return fn(*a, s) * 1e-6 + s * 1e-30
        return lax.fori_loop(0, N_LOOP, body, seed)
    f = jax.jit(run)
    s = f(jnp.float32(0.0), *args)
    float(s)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); s = f(s * 0.0, *args); float(s)
        best = min(best, (time.perf_counter() - t0) / N_LOOP * 1e3)
    return best

from equiadapt_tpu.ops.warp import _twopass_matrices, rotate_twopass_from_nchw

# --- A: input prep variants: fp32 NHWC -> bf16 physical NCHW ---
def prep_current(xx, s):
    xn = jnp.moveaxis(xx + s*1e-30, -1, 1).astype(jnp.bfloat16)
    return jnp.sum(xn.astype(jnp.float32))

def prep_barrier(xx, s):
    xn = jnp.moveaxis(xx + s*1e-30, -1, 1).astype(jnp.bfloat16)
    xn = lax.optimization_barrier(xn)
    return jnp.sum(xn.astype(jnp.float32))

print("prep_current      ", timed_ms(prep_current, x_f32))
print("prep_barrier      ", timed_ms(prep_barrier, x_f32))

# --- B: twopass formulations (bf16 NCHW in -> bf16 NCHW out) ---
xn16 = jnp.moveaxis(x_f32, -1, 1).astype(jnp.bfloat16)

def tp_current(xn, s):
    out = rotate_twopass_from_nchw(xn + jnp.bfloat16(s*1e-30), 45.0, "border")
    return jnp.sum(out.astype(jnp.float32))

def tp_swapped(xn, s):
    dt = xn.dtype
    M1, M2 = _twopass_matrices(H, W, 45.0, "border", dt)
    xx = xn + jnp.bfloat16(s*1e-30)
    V = jnp.einsum("bchw,yhw->bcyw", xx, M1, preferred_element_type=jnp.float32)
    out = jnp.einsum("bcyw,ywx->bcyx", V.astype(dt), M2, preferred_element_type=jnp.float32).astype(dt)
    return jnp.sum(out.astype(jnp.float32))

def tp_dotgen(xn, s):
    # pass2 via explicit dot_general, batch dims (y), to dodge the conv lowering
    dt = xn.dtype
    M1, M2 = _twopass_matrices(H, W, 45.0, "border", dt)
    xx = xn + jnp.bfloat16(s*1e-30)
    V = jnp.einsum("yhw,bchw->bcyw", M1, xx, preferred_element_type=jnp.float32).astype(dt)
    # out[b,c,y,x] = sum_w M2[y,w,x] V[b,c,y,w]: batch y
    Vt = jnp.moveaxis(V, 2, 0)          # (y, b, c, w)
    o = lax.dot_general(Vt.reshape(H, B*C, W), M2, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)  # (y, bc, x)
    out = jnp.moveaxis(o.reshape(H, B, C, W).astype(dt), 0, 2)
    return jnp.sum(out.astype(jnp.float32))

print("tp_current        ", timed_ms(tp_current, xn16))
print("tp_swapped        ", timed_ms(tp_swapped, xn16))
print("tp_dotgen         ", timed_ms(tp_dotgen, xn16))

# --- C: fused end-to-end prep+twopass from fp32 NHWC (what the composite costs) ---
def prep_tp(xx, s):
    xn = jnp.moveaxis(xx + s*1e-30, -1, 1).astype(jnp.bfloat16)
    out = rotate_twopass_from_nchw(xn, 45.0, "border")
    return jnp.sum(out.astype(jnp.float32)) + jnp.sum(xn.astype(jnp.float32))

print("prep+tp (2 cons)  ", timed_ms(prep_tp, x_f32))

# --- D: fp32 HIGHEST one-hot style matmul cost (exact kernel feasibility) ---
x32n = jnp.moveaxis(x_f32, -1, 1)
def f32_onehot_mm(xn, s):
    Sm = (jax.lax.broadcasted_iota(jnp.int32, (H, H), 0) ==
          jax.lax.broadcasted_iota(jnp.int32, (H, H), 1)).astype(jnp.float32)
    xx = xn + s*1e-30
    o = jnp.einsum("yh,bchw->bcyw", Sm, xx, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.sum(o)
print("f32 HIGHEST mm    ", timed_ms(f32_onehot_mm, x32n))
def bf16_onehot_mm(xn, s):
    Sm = (jax.lax.broadcasted_iota(jnp.int32, (H, H), 0) ==
          jax.lax.broadcasted_iota(jnp.int32, (H, H), 1)).astype(jnp.bfloat16)
    xx = xn + jnp.bfloat16(s*1e-30)
    o = jnp.einsum("yh,bchw->bcyw", Sm, xx, preferred_element_type=jnp.float32)
    return jnp.sum(o)
print("bf16 DEFAULT mm   ", timed_ms(bf16_onehot_mm, xn16))
