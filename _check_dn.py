import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from equiadapt_tpu.ops.group_action import get_action_on_image_features
from equiadapt_tpu.ops.pallas.select_warp import rotate_roll_select

rng = np.random.default_rng(0)
n = 8
G = 2 * n
x = jnp.asarray(rng.normal(size=(8, 64, 64, 2 * G)).astype(np.float32)).astype(jnp.bfloat16)
idx = jnp.asarray(rng.integers(0, n, 8).astype(np.int32))
deg = idx.astype(jnp.float32) * (360.0 / n)
refl = jnp.asarray((rng.integers(0, 2, 8)).astype(np.int32))
fused = rotate_roll_select(x, idx, idx, n, 1.0, "zeros", refl=refl)
# CPU-style XLA fallback, forced by calling pieces directly
from equiadapt_tpu.ops.group_action import roll_by_gather
from equiadapt_tpu.ops.warp import hflip, rotate_select_fast
r = refl.astype(x.dtype)[:, None, None, None]
ref = rotate_select_fast(x, idx, n, 1.0, "zeros")
ref = (1.0 - r) * ref + r * hflip(ref)
B, H, W, C = ref.shape
ref5 = ref.reshape(B, H, W, C // G, G)
sh = idx.astype(jnp.float32)
rot_f = roll_by_gather(ref5[..., :n], sh)
ref_f = roll_by_gather(ref5[..., n:], -sh)
ref = jnp.concatenate([rot_f, ref_f], axis=-1).reshape(B, H, W, C)
print("Dn fused bitexact on TPU:", bool((fused == ref).all()), flush=True)
# and through the public engine (dispatch check)
eng = get_action_on_image_features(
    x, num_rotations=n, num_group=G, rotation_deg=deg,
    reflection=refl.astype(jnp.float32), induced_rep_type="regular", mode="fast")
print("engine==fused:", bool((eng == fused).all()), flush=True)
