"""Twopass einsum-order variants in pipeline context (NHWC in -> selectn NCHW)."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

from equiadapt_tpu.ops.warp import _twopass_matrices
from equiadapt_tpu.ops.pallas.select_warp import _pallas_selectn, _c_n_decomposition

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
residues, src_of, k_of = _c_n_decomposition(NUM_ROT, -1.0)
idx = jnp.asarray(rng.integers(0, NUM_ROT, size=(B,)).astype(np.int32))
src_idx = jnp.asarray(src_of, jnp.int32)[idx]
k_idx = jnp.asarray(k_of, jnp.int32)[idx]
xp = pool2(x16)

def tp_a(xx):  # current rotate_twopass_nchw form
    dt = xx.dtype
    M1, M2 = _twopass_matrices(H, W, 45.0, "border", dt)
    V = jnp.einsum("yhw,bhwc->bywc", M1, xx, preferred_element_type=jnp.float32)
    return jnp.einsum("ywx,bywc->bcyx", M2, V.astype(dt),
                      preferred_element_type=jnp.float32).astype(dt)

def tp_b(xx):
    dt = xx.dtype
    M1, M2 = _twopass_matrices(H, W, 45.0, "border", dt)
    V = jnp.einsum("yhw,bhwc->ybwc", M1, xx, preferred_element_type=jnp.float32)
    return jnp.einsum("ywx,ybwc->bcyx", M2, V.astype(dt),
                      preferred_element_type=jnp.float32).astype(dt)

def tp_c(xx):
    dt = xx.dtype
    M1, M2 = _twopass_matrices(H, W, 45.0, "border", dt)
    V = jnp.einsum("yhw,bhwc->bcyw", M1, xx, preferred_element_type=jnp.float32)
    return jnp.einsum("ywx,bcyw->bcyx", M2, V.astype(dt),
                      preferred_element_type=jnp.float32).astype(dt)

def tp_d(xx):
    dt = xx.dtype
    M1, M2 = _twopass_matrices(H, W, 45.0, "border", dt)
    V = jnp.einsum("yhw,bhwc->ywbc", M1, xx, preferred_element_type=jnp.float32)
    return jnp.einsum("ywx,ywbc->bcyx", M2, V.astype(dt),
                      preferred_element_type=jnp.float32).astype(dt)

def chain(tp, xps, si, ki, slot):
    xx = pick(xps, slot)
    xn = jnp.moveaxis(xx, -1, 1)
    x45 = tp(xx)
    out = _pallas_selectn((xn, x45), si, ki, strategy="mixed")
    return jnp.sum(out.astype(jnp.float32))

import functools
ref = None
for name, tp in [("a_bywc", tp_a), ("b_ybwc", tp_b), ("c_bcyw", tp_c), ("d_ywbc", tp_d)]:
    t = timed_ms(functools.partial(chain, tp), xp, src_idx, k_idx)
    o = jax.jit(tp)(x16)
    if ref is None:
        ref = o
        eq = True
    else:
        eq = bool((o == ref).all())
    print(f"chain {name}: {t:.3f} ms  bitexact_vs_a={eq}")
