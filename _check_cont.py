import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from equiadapt_tpu.ops.pallas.shear_rotate import (
    _rot90_centered, pallas_rot90_centered_select, warp_rotate_center_fast,
)

rng = np.random.default_rng(0)
# bit-check on hardware
x8 = jnp.asarray(rng.normal(size=(8, 64, 64, 3)).astype(np.float32))
k8 = jnp.arange(8) % 4
sel = pallas_rot90_centered_select(x8, k8, 32, 32, "border")
ok = True
for b in range(8):
    ref = _rot90_centered(x8[b:b+1], int(k8[b]), 32, 32, "border")
    ok = ok and bool((sel[b] == ref[0]).all())
print("centered select bitexact on TPU:", ok, flush=True)

# continuous warp timing at bench shape
B, H = 256, 224
x = jnp.asarray(rng.normal(size=(B, H, H, 3)).astype(np.float32)).astype(jnp.bfloat16)
ang = jnp.asarray(rng.uniform(0, 2*np.pi, B).astype(np.float32))
R = jnp.stack([jnp.stack([jnp.cos(ang), -jnp.sin(ang)], -1),
               jnp.stack([jnp.sin(ang), jnp.cos(ang)], -1)], -2)

def warp(xx, i):
    xb = xx + i.astype(jnp.bfloat16) * 1e-9
    return jnp.sum(warp_rotate_center_fast(xb, R, "border").astype(jnp.float32))

f = jax.jit(warp)
t0 = time.time()
s = f(x, jnp.float32(0.0)); float(s)
print(f"compile {time.time()-t0:.0f}s", flush=True)
for _ in range(2):
    s = f(x, s*0.0); float(s)
t0 = time.perf_counter()
for kk in range(10):
    s = f(x, s*1e-30 + jnp.float32(kk))
float(s)
print(f"warp_rotate_center_fast {(time.perf_counter()-t0)/10*1e3:.2f} ms (was ~11-13)", flush=True)
