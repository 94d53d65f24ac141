"""A/B: steered (new) vs unsteered (old) selectn kernels on TPU."""
import sys, time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from equiadapt_tpu.ops.pallas.select_warp import (
    _emit_rot90, _pallas_selectn, _c_n_decomposition,
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

@functools.partial(jax.jit, static_argnames=("interpret",))
def selectn_old(sources, src_idx, k_idx, interpret=False):
    sources = tuple(sources)
    B, C, H, W = sources[0].shape
    bc = 1
    for cand in (4, 3, 2, 1):
        if C % cand == 0:
            bc = cand
            break
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, C // bc),
        in_specs=[
            pl.BlockSpec((1, bc, H, W), lambda b, c, src_ref, k_ref: (b, c, 0, 0))
            for _ in sources
        ],
        out_specs=pl.BlockSpec((1, bc, H, W), lambda b, c, src_ref, k_ref: (b, c, 0, 0)),
    )
    def kernel(src_ref, k_ref, *refs):
        src_refs, out_ref = refs[:-1], refs[-1]
        b = pl.program_id(0)
        k = k_ref[b] % 4
        for c in range(bc):
            plane = src_refs[0][0, c]
            for s in range(1, len(src_refs)):
                plane = jnp.where(src_ref[b] == s, src_refs[s][0, c], plane)
            def store(v, c=c):
                out_ref[0, c] = v
            _emit_rot90(plane, k, store, H, W, sources[0].dtype, "fp32")
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), sources[0].dtype),
        interpret=interpret,
    )(src_idx.astype(jnp.int32), k_idx.astype(jnp.int32), *sources)

xn16 = jnp.moveaxis(
    jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)), -1, 1
).astype(jnp.bfloat16)
x45 = jax.jit(lambda a: rotate_twopass_from_nchw(a, 45.0, "border"))(xn16)
residues, src_of, k_of = _c_n_decomposition(NUM_ROT, -1.0)
idx = jnp.asarray(rng.integers(0, NUM_ROT, size=(B,)).astype(np.int32))
src_idx = jnp.asarray(src_of, jnp.int32)[idx]
k_idx = jnp.asarray(k_of, jnp.int32)[idx]

xp, x45p = pool2(xn16), pool2(x45)

def step_old(xps, yps, si, ki, slot):
    out = selectn_old((pick(xps, slot), pick(yps, slot)), si, ki)
    return jnp.sum(out.astype(jnp.float32))

def step_new(xps, yps, si, ki, slot):
    out = _pallas_selectn((pick(xps, slot), pick(yps, slot)), si, ki)
    return jnp.sum(out.astype(jnp.float32))

def step_null(xps, yps, si, ki, slot):
    return jnp.sum(pick(xps, slot).astype(jnp.float32)) + jnp.sum(pick(yps, slot)[0,0,0,:8].astype(jnp.float32))

print("null                 ", timed_ms(step_null, xp, x45p, src_idx, k_idx))
print("selectn OLD (2 reads)", timed_ms(step_old, xp, x45p, src_idx, k_idx))
print("selectn NEW (steered)", timed_ms(step_new, xp, x45p, src_idx, k_idx))
# equality
a = selectn_old((xn16, x45), src_idx, k_idx)
b = _pallas_selectn((xn16, x45), src_idx, k_idx)
print("old==new:", bool((a == b).all()))

# C=16 per-plane grid comparison (the invert kernel's shape)
y16 = jnp.asarray(rng.normal(size=(B, H, W, 16)).astype(np.float32)).astype(jnp.bfloat16)
yn = jnp.moveaxis(y16, -1, 1)
y45 = jax.jit(lambda a: rotate_twopass_from_nchw(a, 45.0, "zeros"))(yn)
ynp, y45p = pool2(yn), pool2(y45)
def step_old16(xps, yps, si, ki, slot):
    out = selectn_old((pick(xps, slot), pick(yps, slot)), si, ki)
    return jnp.sum(out.astype(jnp.float32))
def step_new16(xps, yps, si, ki, slot):
    out = _pallas_selectn((pick(xps, slot), pick(yps, slot)), si, ki)
    return jnp.sum(out.astype(jnp.float32))
print("selectn16 OLD        ", timed_ms(step_old16, ynp, y45p, src_idx, k_idx))
print("selectn16 NEW        ", timed_ms(step_new16, ynp, y45p, src_idx, k_idx))
