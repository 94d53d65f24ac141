"""exp15: (A) batch-pair blocks in select kernel; (C) b-lanes where-select
fused into the bridge transpose + single-source rot90 kernel."""
import functools, sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

from equiadapt_tpu.ops.warp import _twopass_matrices
from equiadapt_tpu.ops.pallas.select_warp import (
    _c_n_decomposition, _latest_used_blocks, _emit_rot90, _pallas_selectn,
)

B, H, W, C = 256, 224, 224, 3
NUM_ROT = 8
N_LOOP = 24
rng = np.random.default_rng(0)


@functools.partial(jax.jit, static_argnames=("bt", "strategy"))
def selectn_pair(sources, src_idx, k_idx, bt=2, strategy="mixed"):
    """Like _pallas_selectn but with bt samples per grid step."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sources = tuple(sources)
    Bb, Cc, Hh, Ww = sources[0].shape
    bc = 3 if Cc % 3 == 0 else 1
    src_idx = src_idx.astype(jnp.int32)
    # per-pair steering: a pair needs source s if ANY of its samples uses s
    pair_src = src_idx.reshape(-1, bt)
    blks = []
    for s in range(len(sources)):
        used = (pair_src == s).any(axis=1)
        piota = jnp.arange(pair_src.shape[0], dtype=jnp.int32)
        seq = jnp.where(used, piota, jnp.int32(-1))
        blk = jax.lax.associative_scan(jnp.maximum, seq)
        blks.append(jnp.maximum(blk, 0).astype(jnp.int32))
    pair_any = [
        (pair_src == s).any(axis=1).astype(jnp.int32)
        for s in range(len(sources))
    ]

    def _spec(s):
        def imap(p, c, src_ref, k_ref, *scal):
            any_s, blk_s = scal[s], scal[len(sources) + s]
            used = any_s[p] == 1
            return (jnp.where(used, p, blk_s[p]), jnp.where(used, c, 0), 0, 0)

        return pl.BlockSpec((bt, bc, Hh, Ww), imap)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 + 2 * len(sources),
        grid=(Bb // bt, Cc // bc),
        in_specs=[_spec(s) for s in range(len(sources))],
        out_specs=pl.BlockSpec((bt, bc, Hh, Ww), lambda p, c, *_: (p, c, 0, 0)),
    )

    def kernel(src_ref, k_ref, *refs):
        src_refs, out_ref = refs[2 * len(sources):-1], refs[-1]
        p = pl.program_id(0)
        for i in range(bt):
            b = p * bt + i
            k = k_ref[b] % 4
            for c in range(bc):
                plane = src_refs[0][i, c]
                for s in range(1, len(src_refs)):
                    plane = jnp.where(src_ref[b] == s, src_refs[s][i, c], plane)

                def store(v, i=i, c=c):
                    out_ref[i, c] = v

                _emit_rot90(plane, k, store, Hh, Ww, sources[0].dtype, strategy)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bb, Cc, Hh, Ww), sources[0].dtype),
    )(src_idx, k_idx.astype(jnp.int32), *pair_any, *blks, *sources)


@functools.partial(jax.jit, static_argnames=("strategy",))
def rot90_only(xn, k_idx, strategy="mixed"):
    """Single-source per-sample rot90 kernel (select already applied)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bb, Cc, Hh, Ww = xn.shape
    bc = 3 if Cc % 3 == 0 else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bb, Cc // bc),
        in_specs=[pl.BlockSpec((1, bc, Hh, Ww), lambda b, c, k_ref: (b, c, 0, 0))],
        out_specs=pl.BlockSpec((1, bc, Hh, Ww), lambda b, c, k_ref: (b, c, 0, 0)),
    )

    def kernel(k_ref, in_ref, out_ref):
        b = pl.program_id(0)
        k = k_ref[b] % 4
        for c in range(bc):
            def store(v, c=c):
                out_ref[0, c] = v
            _emit_rot90(in_ref[0, c], k, store, Hh, Ww, xn.dtype, strategy)

    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bb, Cc, Hh, Ww), xn.dtype),
    )(k_idx.astype(jnp.int32), xn)


def twopass_bcyx(x, angle, padding_mode="border"):
    dt = x.dtype
    M1, M2 = _twopass_matrices(H, W, angle, padding_mode, dt)
    V = jnp.einsum("yhw,bhwc->ywbc", M1, x, preferred_element_type=jnp.float32)
    return jnp.einsum(
        "ywx,ywbc->bcyx", M2, V.astype(dt), preferred_element_type=jnp.float32
    ).astype(dt)


def twopass_ybcx(x, angle, padding_mode="border"):
    dt = x.dtype
    M1, M2 = _twopass_matrices(H, W, angle, padding_mode, dt)
    V = jnp.einsum("yhw,bhwc->ywbc", M1, x, preferred_element_type=jnp.float32)
    return jnp.einsum(
        "ywx,ywbc->ybcx", M2, V.astype(dt), preferred_element_type=jnp.float32
    ).astype(dt)


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


def chain_cur(xps, si, ki, slot):
    xx = pick(xps, slot)
    xn = jnp.moveaxis(xx, -1, 1)
    out = _pallas_selectn((xn, twopass_bcyx(xx, 45.0)), si, ki, strategy="mixed")
    return jnp.sum(out.astype(jnp.float32))


def chain_pair(xps, si, ki, slot, bt=2):
    xx = pick(xps, slot)
    xn = jnp.moveaxis(xx, -1, 1)
    out = selectn_pair((xn, twopass_bcyx(xx, 45.0)), si, ki, bt=bt)
    return jnp.sum(out.astype(jnp.float32))


def chain_blanes(xps, si, ki, slot):
    xx = pick(xps, slot)
    d = twopass_ybcx(xx, 45.0)                      # (Y,B,C,X) logical
    xt = jnp.transpose(xx, (1, 0, 3, 2))            # (H,B,C,W) logical
    sel = jnp.where((si == 1)[None, :, None, None], d, xt)
    sel_bcyx = jnp.transpose(sel, (1, 2, 0, 3))     # (B,C,Y,X)
    out = rot90_only(sel_bcyx, ki)
    return jnp.sum(out.astype(jnp.float32))


print("chain current      ", timed_ms(chain_cur, xp, src_idx, k_idx))
print("chain pair bt=2    ", timed_ms(functools.partial(chain_pair, bt=2), xp, src_idx, k_idx))
print("chain pair bt=4    ", timed_ms(functools.partial(chain_pair, bt=4), xp, src_idx, k_idx))
print("chain b-lanes      ", timed_ms(chain_blanes, xp, src_idx, k_idx))
ref = jax.jit(lambda xx: _pallas_selectn(
    (jnp.moveaxis(xx, -1, 1), twopass_bcyx(xx, 45.0)), src_idx, k_idx,
    strategy="mixed"))(x16)
a = jax.jit(lambda xx: selectn_pair(
    (jnp.moveaxis(xx, -1, 1), twopass_bcyx(xx, 45.0)), src_idx, k_idx, bt=2))(x16)
b_ = jax.jit(lambda xx: rot90_only(jnp.transpose(jnp.where(
    (src_idx == 1)[None, :, None, None], twopass_ybcx(xx, 45.0),
    jnp.transpose(xx, (1, 0, 3, 2))), (1, 2, 0, 3)), k_idx))(x16)
print("pair == current:", bool((a == ref).all()))
print("blanes == current:", bool((b_ == ref).all()))
