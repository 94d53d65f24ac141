import sys, types
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
src = open("/root/repo/.scratch/exp15.py").read()
mod = types.ModuleType("exp15m")
exec(compile(src.split('print("chain current')[0], "exp15", "exec"), mod.__dict__)
from equiadapt_tpu.utils.profiling import profile_trace, device_op_attribution
import functools
for nm, ch in (("blanes", mod.chain_blanes), ("pair2", functools.partial(mod.chain_pair, bt=2))):
    f = jax.jit(lambda seed, xp, si, ki, ch=ch: lax.fori_loop(
        0, 24, lambda it, s: ch(xp, si, ki, (it + jnp.asarray(s*0.0, jnp.int32)) % 2) * 1e-6 + s*1e-30, seed))
    s = f(jnp.float32(0.0), mod.xp, mod.src_idx, mod.k_idx); float(s)
    with profile_trace(f"/tmp/attr15_{nm}"):
        float(f(jnp.float32(0.0), mod.xp, mod.src_idx, mod.k_idx))
    print(f"=== {nm} ===")
    for name, ms in device_op_attribution(f"/tmp/attr15_{nm}", top=10):
        print(f"{ms/24:8.4f} ms  {name[:105]}")
