import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from equiadapt_tpu.ops.pallas.select_warp import rotate_select, _blend_ref
from equiadapt_tpu.ops.warp import rotate_select_fast

rng = np.random.default_rng(0)
for C in (3, 16):
    xs = jnp.asarray(rng.normal(size=(8, 64, 64, C)).astype(np.float32))
    xb = xs.astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, 8, size=(8,)).astype(np.int32))
    ex_p = rotate_select(xs, idx, 8, -1.0, "border", "exact")
    ex_b = _blend_ref(xs, idx, 8, -1.0, "border")
    f_p = rotate_select(xb, idx, 8, 1.0, "zeros", "fast")
    f_x = rotate_select_fast(xb, idx, 8, 1.0, "zeros")
    print(f"C={C} exact bitexact:", bool((ex_p == ex_b).all()),
          "fast bitexact:", bool((f_p == f_x).all()), flush=True)
print("DONE", flush=True)
