"""exp17: decompose the 649ms exact continuous canonicalize; A/B gather forms."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from equiadapt_tpu.ops.warp import rotate, bilinear_sample, _dst_grid
B, H, W, C = 256, 224, 224, 3
N_LOOP = 8
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
ang = jnp.asarray(rng.uniform(-180, 180, size=(B,)).astype(np.float32))

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

xp = pool2(x)

def warp_cur(xps, slot):
    xx = pick(xps, slot)
    return jnp.sum(rotate(xx, ang, padding_mode="border"))

print("exact rotate (current flat-take)", timed_ms(warp_cur, xp))

# variant A: take_along_axis on (B, C, HW) minor axis
def rotate_bchw_minor(xx, angle_deg):
    import math
    dtype = jnp.float32
    rad = jnp.broadcast_to(jnp.asarray(angle_deg, dtype), (B,)) * (math.pi / 180.0)
    a = jnp.cos(rad)[:, None, None]; b = jnp.sin(rad)[:, None, None]
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    gx, gy = _dst_grid(B, H, W, dtype)
    dx = gx - cx; dy = gy - cy
    sx = a * dx - b * dy + cx
    sy = b * dx + a * dy + cy
    x0 = jnp.floor(sx); y0 = jnp.floor(sy)
    fx = sx - x0; fy = sy - y0
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
    xf = jnp.moveaxis(xx, -1, 1).reshape(B, C, H * W)
    out = None
    for ddx, ddy, w in ((0,0,(1-fx)*(1-fy)), (1,0,fx*(1-fy)), (0,1,(1-fx)*fy), (1,1,fx*fy)):
        xc = jnp.clip(x0i + ddx, 0, W - 1); yc = jnp.clip(y0i + ddy, 0, H - 1)
        idx = (yc * W + xc).reshape(B, 1, H * W)
        tap = jnp.take_along_axis(xf, jnp.broadcast_to(idx, (B, C, H * W)), axis=2)
        tap = tap.reshape(B, C, H, W) * w[:, None]
        out = tap if out is None else out + tap
    return jnp.moveaxis(out, 1, -1)

def warp_a(xps, slot):
    xx = pick(xps, slot)
    return jnp.sum(rotate_bchw_minor(xx, ang))

print("exact rotate (bchw minor-axis take_along)", timed_ms(warp_a, xp))

ra = jax.jit(lambda xx: rotate(xx, ang, padding_mode="border"))(x)
rb = jax.jit(lambda xx: rotate_bchw_minor(xx, ang))(x)
print("A == current:", bool((ra == rb).all()), "max|d|:", float(jnp.abs(ra - rb).max()))
