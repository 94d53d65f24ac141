"""Exact-mode gather experiments.

S1: static 45-deg 4-tap warp — current (B,HW,C) axis-1 take vs batch-major
    (HW, B*C) axis-0 take (3KB rows, near-streaming).
S2: dynamic per-sample warp — take_along_axis vs flat global-index take.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

from equiadapt_tpu.ops.warp import _static_warp_taps, _static_rotate

B, H, W, C = 256, 224, 224, 3
rng = np.random.default_rng(0)
N_LOOP = 12

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

x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
xp = pool2(x)
idx_np, wts_np = _static_warp_taps(H, W, 45.0, "border")
IDX = jnp.asarray(idx_np)   # (4, HW)
WTS = jnp.asarray(wts_np)   # (4, HW)

def s_current(xps, slot):
    out = _static_rotate(pick(xps, slot), 45.0, "border")
    return jnp.sum(out)

def s_batchmajor(xps, slot):
    xx = pick(xps, slot)
    flat = jnp.moveaxis(xx.reshape(B, H * W, C), 1, 0).reshape(H * W, B * C)
    out = None
    for t in range(4):
        tap = jnp.take(flat, IDX[t], axis=0) * WTS[t][:, None]
        out = tap if out is None else out + tap
    out = jnp.moveaxis(out.reshape(H * W, B, C), 0, 1).reshape(B, H, W, C)
    return jnp.sum(out)

def s_null(xps, slot):
    return jnp.sum(pick(xps, slot))

print("S1 null        ", timed_ms(s_null, xp))
print("S1 current     ", timed_ms(s_current, xp))
print("S1 batchmajor  ", timed_ms(s_batchmajor, xp))
a = _static_rotate(x, 45.0, "border")
b = jax.jit(lambda xx: jnp.moveaxis(
    (sum(jnp.take(jnp.moveaxis(xx.reshape(B, H*W, C), 1, 0).reshape(H*W, B*C),
                  IDX[t], axis=0) * WTS[t][:, None] for t in range(4))
     ).reshape(H*W, B, C), 0, 1).reshape(B, H, W, C))(x)
print("S1 bitexact:", bool((a == b).all()), "maxdiff:", float(jnp.abs(a-b).max()))

# --- S2: dynamic per-sample (continuous exact) ---
theta = jnp.asarray(rng.uniform(0, 2*np.pi, size=(B,)).astype(np.float32))

def dyn_indices(th):
    ca, sa = jnp.cos(th), jnp.sin(th)   # (B,)
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    gy, gx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    dx = (gx - cx)[None]; dy = (gy - cy)[None]
    sx = ca[:, None, None] * dx - sa[:, None, None] * dy + cx
    sy = sa[:, None, None] * dx + ca[:, None, None] * dy + cy
    x0 = jnp.floor(sx); y0 = jnp.floor(sy)
    fx = sx - x0; fy = sy - y0
    taps = []
    for ddx, ddy, wgt in ((0,0,(1-fx)*(1-fy)), (1,0,fx*(1-fy)),
                          (0,1,(1-fx)*fy), (1,1,fx*fy)):
        xi = jnp.clip(x0 + ddx, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(y0 + ddy, 0, H - 1).astype(jnp.int32)
        taps.append((yi * W + xi, wgt))
    return taps  # [(B,H,W) idx, (B,H,W) w] x4

def d_tal(xps, th, slot):
    xx = pick(xps, slot).reshape(B, H * W, C)
    out = None
    for nidx, wgt in dyn_indices(th):
        tap = jnp.take_along_axis(xx, nidx.reshape(B, H*W)[:, :, None], axis=1)
        tap = tap * wgt.reshape(B, H*W)[:, :, None]
        out = tap if out is None else out + tap
    return jnp.sum(out)

def d_flat(xps, th, slot):
    xx = pick(xps, slot).reshape(B * H * W, C)
    base = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None]
    out = None
    for nidx, wgt in dyn_indices(th):
        gi = (nidx.reshape(B, H * W) + base).reshape(-1)
        tap = jnp.take(xx, gi, axis=0).reshape(B, H*W, C)
        tap = tap * wgt.reshape(B, H*W)[:, :, None]
        out = tap if out is None else out + tap
    return jnp.sum(out)

print("S2 take_along  ", timed_ms(d_tal, xp, theta))
print("S2 flat take   ", timed_ms(d_flat, xp, theta))
va = jax.jit(lambda xx, th: d_tal(pool2(xx), th, 0))(x, theta)
vb = jax.jit(lambda xx, th: d_flat(pool2(xx), th, 0))(x, theta)
print("S2 agree:", float(jnp.abs(va - vb)))
