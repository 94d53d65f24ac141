"""exp22: C8 fast-warp chain variants — shared-NCHW operand, bt sweep."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from equiadapt_tpu.ops.pallas.select_warp import (
    _pallas_selectn, _c_n_decomposition, _rot90_strategy,
)
from equiadapt_tpu.ops.warp import rotate_twopass_nchw, rotate_twopass_from_nchw

B, H, W, C = 256, 224, 224, 3
N_LOOP = 24
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)
idx = jnp.asarray(rng.integers(0, 8, size=(B,)).astype(np.int32))
residues, src_of, k_of = _c_n_decomposition(8, -1.0)
src_idx = jnp.asarray(src_of, jnp.int32)[idx]
k_idx = jnp.asarray(k_of, jnp.int32)[idx]
strat = _rot90_strategy()


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


def v_nhwc(bt):
    def f(xps, slot):
        xx = pick(xps, slot)
        sources = (jnp.moveaxis(xx, -1, 1), rotate_twopass_nchw(xx, residues[1], "border"))
        out = _pallas_selectn(sources, src_idx, k_idx, strategy=strat, bt=bt)
        return jnp.sum(out.astype(jnp.float32))
    return f


def v_shared(bt):
    def f(xps, slot):
        xx = pick(xps, slot)
        xn = jnp.moveaxis(xx, -1, 1)
        sources = (xn, rotate_twopass_from_nchw(xn, residues[1], "border"))
        out = _pallas_selectn(sources, src_idx, k_idx, strategy=strat, bt=bt)
        return jnp.sum(out.astype(jnp.float32))
    return f


xp = pool2(x)
for bt in (1, 2, 4, 8):
    print(f"nhwc-op  bt={bt}: {timed_ms(v_nhwc(bt), xp):.3f} ms")
for bt in (2, 4):
    print(f"shared-n bt={bt}: {timed_ms(v_shared(bt), xp):.3f} ms")
# numeric check shared vs nhwc
a = jax.jit(lambda xx: _pallas_selectn((jnp.moveaxis(xx, -1, 1), rotate_twopass_nchw(xx, residues[1], "border")), src_idx, k_idx, strategy=strat, bt=2))(x)
b = jax.jit(lambda xx: _pallas_selectn((jnp.moveaxis(xx, -1, 1), rotate_twopass_from_nchw(jnp.moveaxis(xx, -1, 1), residues[1], "border")), src_idx, k_idx, strategy=strat, bt=2))(x)
print("shared bit-equal:", bool((a == b).all()), float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max()))
