"""E1: rot90 strategy mixed vs fp32; E2: lax.rev in Mosaic; E3: twopass forms."""
import sys, time, functools, os
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from equiadapt_tpu.ops.pallas.select_warp import (
    _pallas_selectn, _c_n_decomposition,
)
from equiadapt_tpu.ops.warp import _twopass_matrices, rotate_twopass_from_nchw

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

xn16 = jnp.moveaxis(
    jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)), -1, 1
).astype(jnp.bfloat16)
x45 = jax.jit(lambda a: rotate_twopass_from_nchw(a, 45.0, "border"))(xn16)
residues, src_of, k_of = _c_n_decomposition(NUM_ROT, -1.0)
idx = jnp.asarray(rng.integers(0, NUM_ROT, size=(B,)).astype(np.int32))
src_idx = jnp.asarray(src_of, jnp.int32)[idx]
k_idx = jnp.asarray(k_of, jnp.int32)[idx]
xnp, x45p = pool2(xn16), pool2(x45)

# --- E2: does lax.rev compile in Mosaic now? ---
def _rev_kernel(src_ref, k_ref, in_ref, out_ref):
    b = pl.program_id(0)
    plane = in_ref[0, 0, 0]
    @pl.when(k_ref[b] % 4 == 0)
    def _():
        out_ref[0, 0] = plane
    @pl.when(k_ref[b] % 4 == 1)
    def _():
        out_ref[0, 0] = lax.rev(plane.T, (0,))
    @pl.when(k_ref[b] % 4 == 2)
    def _():
        out_ref[0, 0] = lax.rev(plane, (0, 1))
    @pl.when(k_ref[b] % 4 == 3)
    def _():
        out_ref[0, 0] = lax.rev(plane.T, (1,))

def rev_select(sources, si, ki):
    S = len(sources)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, C),
        in_specs=[pl.BlockSpec((1, 1, 1, H, W), lambda b, c, sr, kr: (sr[b], b, c, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, H, W), lambda b, c, sr, kr: (b, c, 0, 0)),
    )
    return pl.pallas_call(
        _rev_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), sources.dtype),
    )(si, ki, sources)

try:
    src2 = jnp.stack([xn16, x45])
    out_rev = jax.jit(rev_select)(src2, src_idx, k_idx)
    ref = _pallas_selectn((xn16, x45), src_idx, k_idx)
    print("E2 lax.rev mosaic: COMPILES, bitexact:", bool((out_rev == ref).all()))
    def step_rev(xps, yps, si, ki, slot):
        out = rev_select(jnp.stack([pick(xps, slot), pick(yps, slot)]), si, ki)
        return jnp.sum(out.astype(jnp.float32))
    print("E2 rev-select (stacked src!)", timed_ms(step_rev, xnp, x45p, src_idx, k_idx))
except Exception as e:
    print("E2 lax.rev mosaic: FAILS:", str(e)[:200])

# --- E1: strategy mixed vs fp32 on the steered selectn ---
def step_sel(strategy, xps, yps, si, ki, slot):
    out = _pallas_selectn((pick(xps, slot), pick(yps, slot)), si, ki, strategy=strategy)
    return jnp.sum(out.astype(jnp.float32))

try:
    a = _pallas_selectn((xn16, x45), src_idx, k_idx, strategy="mixed")
    b_ = _pallas_selectn((xn16, x45), src_idx, k_idx, strategy="fp32")
    print("E1 mixed bitexact vs fp32:", bool((a == b_).all()))
    print("E1 selectn fp32 ", timed_ms(functools.partial(step_sel, "fp32"), xnp, x45p, src_idx, k_idx))
    print("E1 selectn mixed", timed_ms(functools.partial(step_sel, "mixed"), xnp, x45p, src_idx, k_idx))
except Exception as e:
    print("E1 mixed: FAILS:", str(e)[:200])

# --- E3: twopass formulations ---
def tp_current(xps, slot):
    out = rotate_twopass_from_nchw(pick(xps, slot), 45.0, "border")
    return jnp.sum(out.astype(jnp.float32))

def tp_dotgen(xps, slot):
    xn = pick(xps, slot)
    dt = xn.dtype
    M1, M2 = _twopass_matrices(H, W, 45.0, "border", dt)
    V = jnp.einsum("yhw,bchw->bcyw", M1, xn, preferred_element_type=jnp.float32).astype(dt)
    Vt = jnp.moveaxis(V, 2, 0)          # (y, b, c, w)
    o = lax.dot_general(Vt.reshape(H, B*C, W), M2, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
    out = jnp.moveaxis(o.reshape(H, B, C, W).astype(dt), 0, 2)
    return jnp.sum(out.astype(jnp.float32))

def tp_dg_both(xps, slot):
    # pass1 as dot_general batching w: x (b,c,h,w) -> (w, h, bc); M1 (y,h,w)->(w,y,h)
    xn = pick(xps, slot)
    dt = xn.dtype
    M1, M2 = _twopass_matrices(H, W, 45.0, "border", dt)
    xt = jnp.moveaxis(xn.reshape(B * C, H, W), -1, 0)  # (w, bc, h)
    M1t = jnp.moveaxis(M1, -1, 0)  # (w, y, h)
    V = lax.dot_general(M1t, xt, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32).astype(dt)  # (w, y, bc)
    # pass2: out[y, bc, x] = sum_w M2[y,w,x] V[w,y,bc] ; batch y
    Vy = jnp.moveaxis(V, 1, 0)  # (y, w, bc)
    o = lax.dot_general(M2, Vy, (((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)  # (y, x, bc)
    out = jnp.moveaxis(o.astype(dt), 2, 0).reshape(B, C, H, W)
    return jnp.sum(out.astype(jnp.float32))

print("E3 tp_current", timed_ms(tp_current, xnp))
print("E3 tp_dotgen ", timed_ms(tp_dotgen, xnp))
try:
    print("E3 tp_dg_both", timed_ms(tp_dg_both, xnp))
except Exception as e:
    print("E3 tp_dg_both FAILS:", str(e)[:150])

# null baseline: read-the-batch + tiny sum
def null16(xps, slot):
    return jnp.sum(pick(xps, slot).astype(jnp.float32))
print("E3 null (1 read)", timed_ms(null16, xnp))
