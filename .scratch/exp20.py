"""exp20: TPU gather cost model — time vs slice width / operand shape.

All variants gather the same total 12.8M dst pixels; what varies is how
many indices and how many bytes per index.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

N = 256 * 224 * 224          # dst pixels
rng = np.random.default_rng(0)


def timeit(f, *a, reps=5):
    o = f(*a); o.block_until_ready()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); f(*a).block_until_ready(); ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


# 1) row-gather from (R, C) operand: vary C, index count = N
for C in (3, 6, 12, 24, 48):
    R = (256 * 224 * 224 * 3) // C
    op = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, R, size=(N,)).astype(np.int32))
    f = jax.jit(lambda o, i: jnp.take(o, i, axis=0))
    ms = timeit(f, op, idx)
    print(f"take rows (R,{C:3d}) x {N/1e6:.1f}M idx: {ms:8.1f} ms  ({ms*0.94e6/N:.2f} cyc/idx)", flush=True)

# 2) fewer indices, wider rows: half/quarter the indices
for C, M in ((6, N // 2), (12, N // 4), (24, N // 8)):
    R = (256 * 224 * 224 * 3) // C
    op = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, R, size=(M,)).astype(np.int32))
    f = jax.jit(lambda o, i: jnp.take(o, i, axis=0))
    ms = timeit(f, op, idx)
    print(f"take rows (R,{C:3d}) x {M/1e6:.1f}M idx: {ms:8.1f} ms  ({ms*0.94e6/M:.2f} cyc/idx)", flush=True)

# 3) bf16 operand — does dtype change the per-index cost?
op = jnp.asarray(rng.normal(size=((256*224*224*3)//3, 3)).astype(np.float32)).astype(jnp.bfloat16)
idx = jnp.asarray(rng.integers(0, op.shape[0], size=(N,)).astype(np.int32))
f = jax.jit(lambda o, i: jnp.take(o, i, axis=0))
ms = timeit(f, op, idx)
print(f"take rows bf16 (R,3) x {N/1e6:.1f}M idx: {ms:8.1f} ms", flush=True)

# 4) take_along_axis batched form (B, HW, C) gathering (B, M', C)
B, HW, C = 256, 224 * 224, 3
op = jnp.asarray(rng.normal(size=(B, HW, C)).astype(np.float32))
ida = jnp.asarray(rng.integers(0, HW, size=(B, HW, 1)).astype(np.int32))
f = jax.jit(lambda o, i: jnp.take_along_axis(o, i, axis=1))
ms = timeit(f, op, ida)
print(f"take_along (B,HW,3) x {N/1e6:.1f}M idx: {ms:8.1f} ms", flush=True)

# 5) sorted indices — does locality matter?
idx_sorted = jnp.sort(jnp.asarray(rng.integers(0, (256*224*224*3)//3, size=(N,)).astype(np.int32)))
op = jnp.asarray(rng.normal(size=((256*224*224*3)//3, 3)).astype(np.float32))
f = jax.jit(lambda o, i: jnp.take(o, i, axis=0))
ms = timeit(f, op, idx_sorted)
print(f"take rows sorted (R,3) x {N/1e6:.1f}M idx: {ms:8.1f} ms", flush=True)
