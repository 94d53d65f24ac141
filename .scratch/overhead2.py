"""Paired wrapper-overhead: NCHW spine vs generic NHWC-kernel path."""
import os, sys, time
spine = sys.argv[1] if len(sys.argv) > 1 else "auto"
sel = sys.argv[2] if len(sys.argv) > 2 else "nchw"
os.environ["EQUIADAPT_NCHW_SPINE"] = spine
os.environ["EQUIADAPT_SELECT_LAYOUT"] = sel
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

from equiadapt_tpu.images import EquivariantNetwork, GroupEquivariantImageCanonicalization
from equiadapt_tpu.models import ResNet50

IMAGE, NUM_ROT, BATCH = 224, 8, 256
N_LOOP = 24

net_pooled = EquivariantNetwork(
    in_channels=3, out_channels=8, kernel_size=3, group_type="rotation",
    num_rotations=NUM_ROT, num_layers=2, fused_pool_lift=True)
canon = GroupEquivariantImageCanonicalization(
    canonicalization_network=net_pooled, in_shape=(IMAGE, IMAGE, 3),
    input_crop_ratio=1.0, resize_shape=56, num_rotations=NUM_ROT,
    group_type="rotation", warp_mode="fast", compute_dtype=jnp.bfloat16,
    output_dtype="compute")
resnet = ResNet50(num_classes=10, small_images=False, dtype=jnp.bfloat16)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(BATCH, IMAGE, IMAGE, 3)).astype(np.float32))
small = jnp.zeros((2, IMAGE, IMAGE, 3), jnp.float32)
cp = jax.jit(lambda k, s: canon.init(k, s, training=False))(jax.random.key(0), small)
rp = jax.jit(lambda k, s: resnet.init(k, s, training=False))(jax.random.key(1), small)
rp = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, rp)

def pool2(a, eps=1e-6):
    return jnp.stack([a, a + jnp.asarray(eps, a.dtype)])

def pick(p, slot):
    return lax.dynamic_index_in_dim(p, slot, axis=0, keepdims=False)

def timed_ms(fn, *args, reps=1):
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

def bare(rps, xps, slot):
    return jnp.sum(resnet.apply(rps, pick(xps, slot), training=False).astype(jnp.float32))

def wrapped(cps, rps, xps, slot):
    x_c, _ = canon.apply(cps, pick(xps, slot), training=False)
    return jnp.sum(resnet.apply(rps, x_c, training=False).astype(jnp.float32))

xp2 = pool2(x)
timed_ms(bare, rp, xp2)
timed_ms(wrapped, cp, rp, xp2)
diffs, bares = [], []
for _ in range(5):
    tb = timed_ms(bare, rp, xp2)
    tw = timed_ms(wrapped, cp, rp, xp2)
    bares.append(tb); diffs.append(tw - tb)
    print(f"bare {tb:.3f}  wrapped {tw:.3f}  diff {tw-tb:.3f}")
ds = sorted(diffs); med = ds[len(ds)//2]
print(f"RESULT spine={spine} sel={sel}: bare={min(bares):.3f} med_overhead={med:.3f} "
      f"pct={100*med/min(bares):.2f} ci={(max(diffs)-min(diffs))/2:.3f}")
