"""exp23: FUSED select kernel — in-kernel 3-shear residual + rot90 matmuls.

One pallas pass replaces the whole twopass-GEMM + select chain for C_n fast
mode: per sample, read the original plane once, apply the per-sample
residual shear (slopes from SMEM; zero slopes are exact identity), rot90 by
k via exchange matmuls, write once. 2 HBM trips total.

Checks:
  1. fused == rot90^k(shear_rotate_residual(x, r)) composition, bitwise.
  2. fused ~= rotate(x, -theta_g) within interpolation tolerance.
  3. timing vs current twopass+select chain.
"""
import sys, time, math
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from equiadapt_tpu.ops.pallas.select_warp import (
    _emit_rot90, pallas_rotate_select, _c_n_decomposition,
)
from equiadapt_tpu.ops.pallas.shear_rotate import (
    _shear_kernel_body, _max_shift, _ALPHA_MAX, _BETA_MAX,
    shear_rotate_residual,
)
from equiadapt_tpu.ops.warp import rotate

B, H, W, C = 256, 224, 224, 3
NUM_ROT = 8
N_LOOP = 24
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)
idx = jnp.asarray(rng.integers(0, NUM_ROT, size=(B,)).astype(np.int32))


def shear_decomp(n, sign):
    """per-element (k, r_deg) with r in [-45, 45]."""
    ks, rs = [], []
    for g in range(n):
        ang = (sign * (360.0 * g / n)) % 360.0
        k = int(round(ang / 90.0))
        r = ang - 90.0 * k
        ks.append(k % 4)
        rs.append(r)
    return ks, rs


def fused_select_shear(xn, k_idx, ab, padding_mode="border", interpret=False,
                       strategy="mixed", bc=3):
    """xn (B, C, H, W); k_idx (B,); ab (B,2) fp32 [alpha, beta]."""
    Bn, Cn, Hn, Wn = xn.shape
    cx, cy = (Wn - 1) / 2.0, (Hn - 1) / 2.0
    Kx = _max_shift(_ALPHA_MAX, Hn, cy)
    Ky = _max_shift(_BETA_MAX, Wn, cx)
    dt = xn.dtype

    def kernel(k_ref, ab_ref, in_ref, out_ref):
        b = pl.program_id(0)
        alpha = ab_ref[b, 0]
        beta = ab_ref[b, 1]
        k = k_ref[b] % 4
        for c in range(bc):
            img = in_ref[0, c].astype(jnp.float32)
            img = _shear_kernel_body(img, alpha, axis=1, H=Hn, W=Wn, C=1,
                                     center=cy, K=Kx, padding_mode=padding_mode)
            img = _shear_kernel_body(img, beta, axis=0, H=Hn, W=Wn, C=1,
                                     center=cx, K=Ky, padding_mode=padding_mode)
            img = _shear_kernel_body(img, alpha, axis=1, H=Hn, W=Wn, C=1,
                                     center=cy, K=Kx, padding_mode=padding_mode)

            def store(v, c=c):
                out_ref[0, c] = v

            _emit_rot90(img.astype(dt), k, store, Hn, Wn, dt, strategy)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # k_idx
        grid=(Bn, Cn // bc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # ab table
            pl.BlockSpec((1, bc, Hn, Wn), lambda b, c, k_ref: (b, c, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bc, Hn, Wn), lambda b, c, k_ref: (b, c, 0, 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bn, Cn, Hn, Wn), dt),
        interpret=interpret,
    )(k_idx.astype(jnp.int32), ab, xn)


SIGN = -1.0
ks, rs = shear_decomp(NUM_ROT, SIGN)
k_tab = jnp.asarray(ks, jnp.int32)
r_tab_deg = jnp.asarray(rs, jnp.float32)
k_idx = k_tab[idx]
r_rad = (r_tab_deg * (math.pi / 180.0))[idx]
alpha = -jnp.tan(r_rad / 2.0)
beta = jnp.sin(r_rad)
ab = jnp.stack([alpha, beta], axis=-1)

xn = jnp.moveaxis(x, -1, 1)

# --- correctness ---
fused = jax.jit(lambda xn_, ki, ab_: fused_select_shear(xn_, ki, ab_))(xn, k_idx, ab)
fused_nhwc = jnp.moveaxis(fused, 1, -1)

# composition reference: shear residual then exact rot90 one-hot blend
sheared = jax.jit(lambda xx, rr: shear_rotate_residual(
    xx, rr, (W - 1) / 2.0, (H - 1) / 2.0, "border"))(x, r_rad)
oh = jax.nn.one_hot(k_idx, 4, dtype=x.dtype)
comp = sum(jnp.rot90(sheared, k=j, axes=(1, 2)) * oh[:, j][:, None, None, None]
           for j in range(4))
print("fused == shear∘rot90 comp:", bool((fused_nhwc == comp).all()),
      float(jnp.abs(fused_nhwc.astype(jnp.float32) - comp.astype(jnp.float32)).max()), flush=True)

# sanity vs exact rotate
ref = jax.jit(lambda xx: rotate(xx.astype(jnp.float32),
                                SIGN * (360.0 / NUM_ROT) * idx.astype(jnp.float32),
                                padding_mode="border"))(x)
err = float(jnp.abs(fused_nhwc.astype(jnp.float32) - ref).max())
print("fused vs exact rotate max|d|:", err, flush=True)

# current fast path for comparison
cur = jax.jit(lambda xx: pallas_rotate_select(xx, idx, NUM_ROT, SIGN, "border",
                                              mode="fast"))(x)
errc = float(jnp.abs(cur.astype(jnp.float32) - ref).max())
print("current vs exact rotate max|d|:", errc, flush=True)

# --- timing ---
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


xp = pool2(x)
xnp = pool2(xn)

def v_cur(xps, slot):
    out = pallas_rotate_select(pick(xps, slot), idx, NUM_ROT, SIGN, "border",
                               mode="fast")
    return jnp.sum(out.astype(jnp.float32))

def v_fused_nchw_in(xps, slot):
    out = fused_select_shear(pick(xps, slot), k_idx, ab)
    return jnp.sum(out.astype(jnp.float32))

def v_fused_nhwc_in(xps, slot):
    xn_ = jnp.moveaxis(pick(xps, slot), -1, 1)
    out = fused_select_shear(xn_, k_idx, ab)
    return jnp.sum(jnp.moveaxis(out, 1, -1).astype(jnp.float32))

for bc in (1, 3):
    f = lambda xps, slot, bc=bc: jnp.sum(
        fused_select_shear(pick(xps, slot), k_idx, ab, bc=bc).astype(jnp.float32))
    print(f"fused kernel alone (NCHW in/out, bc={bc}):", timed_ms(f, xnp), "ms", flush=True)
print("fused chain (NHWC in, moveaxis brackets):", timed_ms(v_fused_nhwc_in, xp), "ms", flush=True)
print("current chain (NHWC in, twopass+select):", timed_ms(v_cur, xp), "ms", flush=True)
