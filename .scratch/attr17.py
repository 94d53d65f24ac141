"""Round-4: canonicalize-only attribution at the bench serving config."""
import sys, shutil
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, "/root/repo")
from equiadapt_tpu.images import EquivariantNetwork, GroupEquivariantImageCanonicalization
from equiadapt_tpu.utils.profiling import profile_trace, device_op_attribution

IMAGE, NUM_ROT, BATCH = 224, 8, 256

net_pooled = EquivariantNetwork(
    in_channels=3, out_channels=8, kernel_size=3, group_type="rotation",
    num_rotations=NUM_ROT, num_layers=2, fused_pool_lift=True)
canon = GroupEquivariantImageCanonicalization(
    canonicalization_network=net_pooled, in_shape=(IMAGE, IMAGE, 3),
    input_crop_ratio=1.0, resize_shape=56, num_rotations=NUM_ROT,
    group_type="rotation", warp_mode="fast", compute_dtype=jnp.bfloat16,
    output_dtype="compute")

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(BATCH, IMAGE, IMAGE, 3)).astype(np.float32))
small = jnp.zeros((2, IMAGE, IMAGE, 3), jnp.float32)
cp = jax.jit(lambda k, s: canon.init(k, s, training=False))(jax.random.key(0), small)

@jax.jit
def canon_only(cp, xx):
    x_c, _ = canon.apply(cp, xx, training=False)
    return jnp.sum(x_c.astype(jnp.float32))

float(canon_only(cp, x))
d = "/tmp/eqt_attr17"
shutil.rmtree(d, ignore_errors=True)
for _ in range(3):
    float(canon_only(cp, x))
with profile_trace(d):
    for _ in range(16):
        float(canon_only(cp, x))
rows = device_op_attribution(d, top=400)
tot = sum(ms for _, ms in rows)
print(f"=== canon_only: total {tot/16:.3f} ms/iter ({len(rows)} ops) ===")
acc = 0.0
for nm, ms in rows:
    if ms / 16 < 0.004:
        acc += ms / 16
        continue
    print(f"{ms/16:8.4f} ms  {nm[:120]}")
print(f"{acc:8.4f} ms  (tail of small ops)")
