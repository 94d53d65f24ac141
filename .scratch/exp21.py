"""exp21: discrete C8 fast warp — current two-pass+select chain vs the
continuous path's 3-shear + rot90-select kernels, at serving shape."""
import sys, time, math
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from equiadapt_tpu.ops.pallas.select_warp import pallas_rotate_select_nchw
from equiadapt_tpu.ops.pallas.shear_rotate import (
    shear_rotate_residual, pallas_rot90_centered_select, warp_rotate_center_fast,
)

B, H, W, C = 256, 224, 224, 3
N_LOOP = 24
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)
xn = jnp.moveaxis(x, -1, 1)
idx = jnp.asarray(rng.integers(0, 8, size=(B,)).astype(np.int32))


def pool2(a, eps=1e-3):
    return jnp.stack([a, a + jnp.asarray(eps, a.dtype)])


def pick(p, slot):
    return lax.dynamic_index_in_dim(p, slot, axis=0, keepdims=False)


def timed_ms(fn, *args, reps=4):
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


# current chain (NCHW spine): two-pass GEMM 45 + pairing select kernel
def cur(xps, idxs, slot):
    out = pallas_rotate_select_nchw(pick(xps, slot), idx, 8, -1.0, "border")
    return jnp.sum(out.astype(jnp.float32))


# shear chain: per-sample angle theta = -(-45*idx)? match select semantics:
# canonicalize applies rot(-theta_g); the select path realizes
# rot90^k(residual source). For timing, any per-sample angle works.
ang = (2.0 * math.pi / 8.0) * idx.astype(jnp.float32)
Rm = jnp.stack(
    [jnp.stack([jnp.cos(ang), -jnp.sin(ang)], -1),
     jnp.stack([jnp.sin(ang), jnp.cos(ang)], -1)], -2)


def shear_chain(xps, Rs, slot):
    out = warp_rotate_center_fast(pick(xps, slot), Rm, "border")
    return jnp.sum(out.astype(jnp.float32))


# shear kernel alone and rot90-select alone
r_res = ang - jnp.round(ang / (math.pi / 2)) * (math.pi / 2)


def shear_only(xps, slot):
    out = shear_rotate_residual(pick(xps, slot), r_res, (W - 1) / 2.0, (H - 1) / 2.0, "border")
    return jnp.sum(out.astype(jnp.float32))


k_idx = jnp.mod(jnp.round(ang / (math.pi / 2)).astype(jnp.int32), 4)


def rot90_only(xps, slot):
    out = pallas_rot90_centered_select(pick(xps, slot), k_idx, W // 2, H // 2, "border")
    return jnp.sum(out.astype(jnp.float32))


xp = pool2(x)
xnp = pool2(xn)
print("current two-pass+select (NCHW):", timed_ms(cur, xnp, idx), "ms")
print("warp_rotate_center_fast (shear+rot90 two kernels):", timed_ms(shear_chain, xp, Rm), "ms")
print("shear_rotate_residual alone:", timed_ms(shear_only, xp), "ms")
print("pallas_rot90_centered_select alone:", timed_ms(rot90_only, xp), "ms")
