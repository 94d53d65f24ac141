"""Mixed-source select kernel: src0 NCHW blocks, src1 NHWC-flat blocks.

Goal: consume the twopass pass-2 output in its natural (b, y, x, c)
emission so the 0.31 ms boundary relayout disappears. Output stays NCHW.
Odd (45-deg) samples rot90 their interleaved plane with the ilv algebra,
then de-interleave to NCHW planes for the store.
"""
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
    _pallas_selectn, _latest_used_blocks, _c_n_decomposition, _emit_rot90,
)
from equiadapt_tpu.ops.warp import _twopass_matrices

B, H, W, C = 256, 224, 224, 3
NUM_ROT = 8
rng = np.random.default_rng(0)
N_LOOP = 24
WC = W * C


def mixed_select(xn, x45f, src_idx, k_idx, interpret=False):
    """xn (B, C, H, W); x45f (B, H, W*C). out (B, C, H, W)."""
    blks = _latest_used_blocks(src_idx, 2)

    def imap0(b, src_ref, k_ref, b0, b1):
        used = src_ref[b] == 0
        return (jnp.where(used, b, b0[b]), 0, 0, 0)

    def imap1(b, src_ref, k_ref, b0, b1):
        used = src_ref[b] == 1
        return (jnp.where(used, b, b1[b]), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, C, H, W), imap0),
            pl.BlockSpec((1, H, WC), imap1),
        ],
        out_specs=pl.BlockSpec((1, C, H, W), lambda b, *_: (b, 0, 0, 0)),
    )

    def kernel(src_ref, k_ref, b0, b1, x0_ref, x1_ref, out_ref):
        b = pl.program_id(0)
        k = k_ref[b] % 4
        use1 = src_ref[b] == 1
        dt = x0_ref.dtype
        # path A (src0, NCHW): per-plane rot90 exactly like _pallas_selectn
        for c in range(C):
            def store(v, c=c):
                @pl.when(jnp.logical_not(use1))
                def _():
                    out_ref[0, c] = v
            _emit_rot90(x0_ref[0, c], k, store, H, W, dt, "mixed")
        # path B (src1, interleaved): rot90 in interleaved layout, then
        # de-interleave each channel to its NCHW out plane
        Z = x1_ref[0].astype(jnp.bfloat16)
        prec = jax.lax.Precision.DEFAULT

        def dot(a, bb):
            return jax.lax.dot_general(
                a, bb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)

        ri = jax.lax.broadcasted_iota(jnp.int32, (H, H), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (H, H), 1)
        ex = (ri + ci == H - 1).astype(jnp.bfloat16)
        rsel = jax.lax.broadcasted_iota(jnp.int32, (WC, W), 0)
        csel = jax.lax.broadcasted_iota(jnp.int32, (WC, W), 1)
        for c in range(C):
            sc = ((rsel // C == csel) & (rsel % C == c)).astype(jnp.bfloat16)
            y_c = dot(Z, sc).astype(jnp.bfloat16)  # (H, W) channel plane

            def store1(v, c=c):
                @pl.when(use1)
                def _():
                    out_ref[0, c] = v
            _emit_rot90(y_c, k, store1, H, W, dt, "mixed")

    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), xn.dtype),
        interpret=interpret,
    )(src_idx.astype(jnp.int32), k_idx.astype(jnp.int32), *blks, xn, x45f)


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

def tp45_byxc(xx):
    dt = xx.dtype
    M1, M2 = _twopass_matrices(H, W, 45.0, "border", dt)
    V = jnp.einsum("yhw,bhwc->ywbc", M1, xx, preferred_element_type=jnp.float32)
    return jnp.einsum("ywx,ywbc->byxc", M2, V.astype(dt),
                      preferred_element_type=jnp.float32).astype(dt)

def tp45_bcyx(xx):
    dt = xx.dtype
    M1, M2 = _twopass_matrices(H, W, 45.0, "border", dt)
    V = jnp.einsum("yhw,bhwc->ywbc", M1, xx, preferred_element_type=jnp.float32)
    return jnp.einsum("ywx,ywbc->bcyx", M2, V.astype(dt),
                      preferred_element_type=jnp.float32).astype(dt)

def chain_mixed(xps, si, ki, slot):
    xx = pick(xps, slot)
    xn = jnp.moveaxis(xx, -1, 1)
    x45f = tp45_byxc(xx).reshape(B, H, WC)
    out = mixed_select(xn, x45f, si, ki)
    return jnp.sum(out.astype(jnp.float32))

def chain_cur(xps, si, ki, slot):
    xx = pick(xps, slot)
    xn = jnp.moveaxis(xx, -1, 1)
    x45 = tp45_bcyx(xx)
    out = _pallas_selectn((xn, x45), si, ki, strategy="mixed")
    return jnp.sum(out.astype(jnp.float32))

print("chain current (d-form) ", timed_ms(chain_cur, xp, src_idx, k_idx))
print("chain mixed-src        ", timed_ms(chain_mixed, xp, src_idx, k_idx))
# correctness
a = jax.jit(lambda xx: _pallas_selectn(
    (jnp.moveaxis(xx, -1, 1), tp45_bcyx(xx)), src_idx, k_idx, strategy="mixed"))(x16)
b_ = jax.jit(lambda xx: mixed_select(
    jnp.moveaxis(xx, -1, 1), tp45_byxc(xx).reshape(B, H, WC), src_idx, k_idx))(x16)
print("mixed == current:", bool((a == b_).all()))
