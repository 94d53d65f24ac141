"""Isolated kernel A/B: NCHW selectn vs NHWC interleaved selectn (new algebra)."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

from equiadapt_tpu.ops.pallas.select_warp import (
    _pallas_selectn, _pallas_selectn_ilv, _c_n_decomposition,
)
from equiadapt_tpu.ops.warp import rotate_twopass_from_nchw

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

x16 = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)
xn16 = jnp.moveaxis(x16, -1, 1)
x45n = jax.jit(lambda a: rotate_twopass_from_nchw(a, 45.0, "border"))(xn16)
x45f = jnp.moveaxis(x45n, 1, -1).reshape(B, H, W * C)
x16f = x16.reshape(B, H, W * C)
residues, src_of, k_of = _c_n_decomposition(NUM_ROT, -1.0)
idx = jnp.asarray(rng.integers(0, NUM_ROT, size=(B,)).astype(np.int32))
src_idx = jnp.asarray(src_of, jnp.int32)[idx]
k_idx = jnp.asarray(k_of, jnp.int32)[idx]

xnp, x45np = pool2(xn16), pool2(x45n)
xfp, x45fp = pool2(x16f), pool2(x45f)

def step_nchw(xps, yps, si, ki, slot):
    out = _pallas_selectn((pick(xps, slot), pick(yps, slot)), si, ki,
                          strategy="mixed")
    return jnp.sum(out.astype(jnp.float32))

def step_ilv(xps, yps, si, ki, slot):
    out = _pallas_selectn_ilv((pick(xps, slot), pick(yps, slot)), si, ki, C,
                              strategy="mixed")
    return jnp.sum(out.astype(jnp.float32))

def step_null(xps, yps, si, ki, slot):
    return jnp.sum(pick(xps, slot).astype(jnp.float32)) + jnp.sum(pick(yps, slot)[0, 0, :8].astype(jnp.float32))

def step_null_n(xps, yps, si, ki, slot):
    return jnp.sum(pick(xps, slot).astype(jnp.float32)) + jnp.sum(pick(yps, slot)[0, 0, 0, :8].astype(jnp.float32))

print("null flat            ", timed_ms(step_null, xfp, x45fp, src_idx, k_idx))
print("null nchw            ", timed_ms(step_null_n, xnp, x45np, src_idx, k_idx))
print("selectn NCHW (mixed) ", timed_ms(step_nchw, xnp, x45np, src_idx, k_idx))
print("selectn ILV  (mixed) ", timed_ms(step_ilv, xfp, x45fp, src_idx, k_idx))
# all-identity steering (serving-like): k=0 everywhere
id_src = jnp.zeros((B,), jnp.int32)
id_k = jnp.zeros((B,), jnp.int32)
print("selectn ILV  (all-k0)", timed_ms(step_ilv, xfp, x45fp, id_src, id_k))
# equality on hardware
a = _pallas_selectn((xn16, x45n), src_idx, k_idx, strategy="mixed")
b = _pallas_selectn_ilv((x16f, x45f), src_idx, k_idx, C, strategy="mixed")
print("nchw==ilv:", bool((jnp.moveaxis(a, 1, -1).reshape(B, H, W * C) == b).all()))
