import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import importlib.util, types
src = open("/root/repo/.scratch/exp14.py").read()
mod = types.ModuleType("exp14m")
exec(compile(src.split('print("chain current')[0], "exp14", "exec"), mod.__dict__)
from equiadapt_tpu.utils.profiling import profile_trace, device_op_attribution
f = jax.jit(lambda seed, xp, si, ki: lax.fori_loop(
    0, 24, lambda it, s: mod.chain_dform(xp, si, ki, (it + jnp.asarray(s*0.0, jnp.int32)) % 2) * 1e-6 + s*1e-30, seed))
s = f(jnp.float32(0.0), mod.xp, mod.src_idx, mod.k_idx); float(s)
with profile_trace("/tmp/attr14b"):
    float(f(jnp.float32(0.0), mod.xp, mod.src_idx, mod.k_idx))
for name, ms in device_op_attribution("/tmp/attr14b", top=12):
    print(f"{ms/24:8.4f} ms  {name[:110]}")
