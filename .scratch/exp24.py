"""exp24: exact-mode shaves.

A. continuous exact: slab bilinear vs 4-tap flat-take (bit-equality + time).
B. static 45-deg warp: slab static taps vs current 4-take (time).
C. fp32 select rot90: Precision.HIGH (bf16x3, 3-pass) vs HIGHEST (6-pass)
   exchange matmuls — bit-equality on fp32 payloads + time.
"""
import sys, time, math
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import os
from equiadapt_tpu.ops.warp import (
    rotate, _bilinear_sample_slab, _static_rotate, _static_warp_taps,
)

B, H, W, C = 256, 224, 224, 3
N_LOOP = 8
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
ang = jnp.asarray(rng.uniform(-180, 180, size=(B,)).astype(np.float32))


def pool2(a, eps=1e-6):
    return jnp.stack([a, a + jnp.asarray(eps, a.dtype)])


def pick(p, slot):
    return lax.dynamic_index_in_dim(p, slot, axis=0, keepdims=False)


def timed_ms(fn, *args, reps=3, n_loop=N_LOOP):
    def run(seed, *a):
        def body(it, s):
            slot = (it + jnp.asarray(s * 0.0, jnp.int32)) % 2
            return fn(*a, slot) * 1e-6 + s * 1e-30
        return lax.fori_loop(0, n_loop, body, seed)
    f = jax.jit(run)
    s = f(jnp.float32(0.0), *args); float(s)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); s = f(s * 0.0, *args); float(s)
        best = min(best, (time.perf_counter() - t0) / n_loop * 1e3)
    return best


xp = pool2(x)

# --- A: continuous exact rotate ---
os.environ["EQUIADAPT_BILINEAR_GATHER"] = "taps"
ra = jax.jit(lambda xx: rotate(xx, ang, padding_mode="border"))(x)
t_taps = timed_ms(lambda xps, s: jnp.sum(rotate(pick(xps, s), ang, padding_mode="border")), xp)
os.environ["EQUIADAPT_BILINEAR_GATHER"] = "slab"
rb = jax.jit(lambda xx: rotate(xx, ang, padding_mode="border"))(x)
t_slab = timed_ms(lambda xps, s: jnp.sum(rotate(pick(xps, s), ang, padding_mode="border")), xp)
print(f"A. slab == taps: {bool((ra == rb).all())}  taps {t_taps:.1f} ms  slab {t_slab:.1f} ms", flush=True)

# --- B: static 45-deg warp (exact mode residual source) ---
def static_rotate_slab(xx, angle_deg, padding_mode):
    Bq, Hq, Wq, Cq = xx.shape
    idx, wts = _static_warp_taps(Hq, Wq, float(angle_deg) % 360.0, padding_mode)
    # reconstruct y0c/x0c and offsets from the 4 clipped taps
    i00, i10, i01, i11 = [i.astype(np.int64) for i in idx]
    y00, x00 = i00 // Wq, i00 % Wq
    y11, x11 = i11 // Wq, i11 % Wq
    x0c = np.clip(np.minimum(x00, x11), 0, Wq - 2)
    y0c = np.clip(np.minimum(y00, y11), 0, Hq - 2)
    a_offs = [(i // Wq - y0c).astype(np.int32) for i in (i00, i10, i01, i11)]
    b_offs = [(i % Wq - x0c).astype(np.int32) for i in (i00, i10, i01, i11)]
    p00 = ((y0c * Wq + x0c) * Cq).astype(np.int32)
    N = Hq * Wq
    xf = xx.reshape(Bq, Hq * Wq * Cq)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
    )
    def run2c(starts):
        out = lax.gather(
            xf.reshape(-1),
            (starts[None, :] + (jnp.arange(Bq, dtype=jnp.int32) * (Hq * Wq * Cq))[:, None]).reshape(-1)[:, None],
            dn, slice_sizes=(2 * Cq,),
            mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
        return out.reshape(Bq, N, 2, Cq)
    top = run2c(jnp.asarray(p00))
    bot = run2c(jnp.asarray(p00 + Wq * Cq))
    def pick_t(a_off, b_off):
        rows = jnp.where(jnp.asarray(a_off)[None, :, None, None] == 0, top, bot)
        return jnp.where(jnp.asarray(b_off)[None, :, None] == 0, rows[:, :, 0], rows[:, :, 1])
    out = sum(pick_t(a_offs[t], b_offs[t]) * jnp.asarray(wts[t])[None, :, None]
              for t in range(4))
    return out.reshape(Bq, Hq, Wq, Cq)

sa = jax.jit(lambda xx: _static_rotate(xx, 45.0, "border"))(x)
sb = jax.jit(lambda xx: static_rotate_slab(xx, 45.0, "border"))(x)
print("B. static slab == static take:", bool((sa == sb).all()),
      float(jnp.abs(sa - sb).max()), flush=True)
t_st = timed_ms(lambda xps, s: jnp.sum(_static_rotate(pick(xps, s), 45.0, "border")), xp)
t_ss = timed_ms(lambda xps, s: jnp.sum(static_rotate_slab(pick(xps, s), 45.0, "border")), xp)
print(f"B. static take {t_st:.2f} ms   static slab {t_ss:.2f} ms", flush=True)

# --- C: fp32 rot90 exchange matmul precision ---
M = jnp.asarray(rng.normal(size=(224, 224)).astype(np.float32))
ri = lax.broadcasted_iota(jnp.int32, (224, 224), 0)
ci = lax.broadcasted_iota(jnp.int32, (224, 224), 1)
ex = (ri + ci == 223).astype(jnp.float32)
for prec in ("highest", "high", "default"):
    r = jax.jit(lambda m: lax.dot_general(
        ex, m, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec))(M)
    exact = bool((r == M[::-1]).all())
    print(f"C. fp32 exchange matmul precision={prec}: exact={exact}", flush=True)
