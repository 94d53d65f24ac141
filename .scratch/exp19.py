"""exp19: kill the pass-2 -> select bridge copy.

Idea: pass-2 as explicit dot_general(V (Y,W,BC), M2 (Y,W,X)) with batch=Y,
contract=W -> output (Y, BC, X) = the GEMM's NATIVE (batch, M, N) layout
with X on lanes. If XLA emits it copy-free, the select kernel can consume
source-1 directly from the (Y, B, C, X) view via a (H, 1, bc, W) BlockSpec;
the per-plane extraction [h, 0, c, :] happens in VMEM.
"""
import functools, sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

from equiadapt_tpu.ops.warp import _twopass_matrices
from equiadapt_tpu.ops.pallas.select_warp import (
    _c_n_decomposition, _latest_used_blocks, _emit_rot90,
)

B, H, W, C = 256, 224, 224, 3
NUM_ROT = 8
N_LOOP = 24
rng = np.random.default_rng(0)

x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)
idx = jnp.asarray(rng.integers(0, NUM_ROT, size=(B,)).astype(np.int32))
residues, src_of, k_of = _c_n_decomposition(NUM_ROT, -1.0)
src_idx = jnp.asarray(src_of, jnp.int32)[idx]
k_idx = jnp.asarray(k_of, jnp.int32)[idx]


def twopass_ybcx(x, angle_deg, padding_mode="border"):
    """Pass-1 einsum (ywbc) + pass-2 dot_general -> (Y, B*C, X)."""
    B, H, W, C = x.shape
    dt = x.dtype
    M1, M2 = _twopass_matrices(H, W, angle_deg, padding_mode, dt)
    V = jnp.einsum("yhw,bhwc->ywbc", M1, x, preferred_element_type=jnp.float32)
    V = V.astype(dt).reshape(H, W, B * C)
    out = lax.dot_general(
        V, M2, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (Y, BC, X)
    return out.astype(dt)


@functools.partial(jax.jit, static_argnames=("interpret",))
def selectn_ybcx(src0_nchw, src1_ybcx, src_idx, k_idx, interpret=False):
    """Two-source select; source 1 arrives in (Y, B, C, X) layout."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bb, Cc, Hh, Ww = src0_nchw.shape
    bc = 3 if Cc % 3 == 0 else 1
    src_idx = src_idx.astype(jnp.int32)
    blks = _latest_used_blocks(src_idx, 2)

    def imap0(b, c, src_ref, k_ref, blk0, blk1):
        used = src_ref[b] == 0
        return (jnp.where(used, b, blk0[b]), jnp.where(used, c, 0), 0, 0)

    def imap1(b, c, src_ref, k_ref, blk0, blk1):
        used = src_ref[b] == 1
        return (0, jnp.where(used, b, blk1[b]), jnp.where(used, c, 0), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(Bb, Cc // bc),
        in_specs=[
            pl.BlockSpec((1, bc, Hh, Ww), imap0),
            pl.BlockSpec((Hh, 1, bc, Ww), imap1),
        ],
        out_specs=pl.BlockSpec((1, bc, Hh, Ww), lambda b, c, *_: (b, c, 0, 0)),
    )

    def kernel(src_ref, k_ref, blk0, blk1, in0, in1, out_ref):
        b = pl.program_id(0)
        k = k_ref[b] % 4
        for c in range(bc):
            p0 = in0[0, c]
            p1 = in1[:, 0, c, :]
            plane = jnp.where(src_ref[b] == 1, p1, p0)

            def store(v, c=c):
                out_ref[0, c] = v

            _emit_rot90(plane, k, store, Hh, Ww, src0_nchw.dtype, "mixed")

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bb, Cc, Hh, Ww), src0_nchw.dtype),
        interpret=interpret,
    )(src_idx, k_idx.astype(jnp.int32), *blks, src0_nchw, src1_ybcx)


def chain_new(xx, si, ki):
    s1 = twopass_ybcx(xx, residues[1]).reshape(H, B, C, W)
    s0 = jnp.moveaxis(xx, -1, 1)
    out = selectn_ybcx(s0, s1, si, ki)
    return jnp.moveaxis(out, 1, -1)


def chain_cur(xx, si, ki):
    from equiadapt_tpu.ops.pallas.select_warp import pallas_rotate_select
    return pallas_rotate_select(xx, idx, NUM_ROT, -1.0, "border", mode="fast")


def pool2(a, eps=1e-3):
    return jnp.stack([a, a + jnp.asarray(eps, a.dtype)])


def pick(p, slot):
    return lax.dynamic_index_in_dim(p, slot, axis=0, keepdims=False)


def timed_ms(fn, *args, reps=4):
    def run(seed, *a):
        def body(it, s):
            slot = (it + jnp.asarray(s * 0.0, jnp.int32)) % 2
            return jnp.sum(fn(pick(a[0], slot), *a[1:]).astype(jnp.float32)) * 1e-6 + s * 1e-30
        return lax.fori_loop(0, N_LOOP, body, seed)
    f = jax.jit(run)
    s = f(jnp.float32(0.0), *args); float(s)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); s = f(s * 0.0, *args); float(s)
        best = min(best, (time.perf_counter() - t0) / N_LOOP * 1e3)
    return best


# correctness
a = jax.jit(chain_cur)(x, src_idx, k_idx)
b = jax.jit(chain_new)(x, src_idx, k_idx)
print("new == current:", bool((a == b).all()),
      "max|d|:", float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max()))

xp = pool2(x)
print("chain current:", timed_ms(chain_cur, xp, src_idx, k_idx), "ms")
print("chain ybcx   :", timed_ms(chain_new, xp, src_idx, k_idx), "ms")
