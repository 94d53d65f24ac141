"""Variant lab: full wrapped step (energy+select+resnet) arrangements."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

from equiadapt_tpu.images import EquivariantNetwork
from equiadapt_tpu.models import ResNet50
from equiadapt_tpu.ops.pallas.select_warp import (
    _pallas_selectn, _c_n_decomposition,
)
from equiadapt_tpu.ops.warp import rotate_twopass_nchw, rotate_twopass_from_nchw

IMAGE, NUM_ROT, BATCH = 224, 8, 256
DT = jnp.bfloat16
net = EquivariantNetwork(in_channels=3, out_channels=8, kernel_size=3,
                         group_type="rotation", num_rotations=NUM_ROT,
                         num_layers=2, fused_pool_lift=True)
resnet = ResNet50(num_classes=10, small_images=False, dtype=DT)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(BATCH, IMAGE, IMAGE, 3)).astype(np.float32))
small = jnp.zeros((2, 56, 56, 3), jnp.float32)
np_ = jax.jit(lambda k, s: net.init(k, s, training=False))(jax.random.key(0), small)
rp = jax.jit(lambda k, s: resnet.init(k, s, training=False))(
    jax.random.key(1), jnp.zeros((2, IMAGE, IMAGE, 3), jnp.float32))
rp = jax.tree_util.tree_map(lambda a: a.astype(DT) if a.dtype == jnp.float32 else a, rp)

residues, src_of, k_of = _c_n_decomposition(NUM_ROT, -1.0)
SRC_OF = jnp.asarray(src_of, jnp.int32)
K_OF = jnp.asarray(k_of, jnp.int32)

def energy_nhwc(npar, x16):
    e = jax.image.resize(x16, (x16.shape[0], 56, 56, 3), method="linear")
    return net.apply(npar, e, training=False)

def energy_nchw(npar, xn):
    B = xn.shape[0]
    e = jax.image.resize(xn, (B, 3, 56, 56), method="linear")
    return net.apply(npar, jnp.moveaxis(e, 1, -1), training=False)

def select(xn, x45, idx):
    si, ki = SRC_OF[idx], K_OF[idx]
    return _pallas_selectn((xn, x45), si, ki)

def make(variant):
    def step(cp, rps, xps, slot):
        xx = lax.dynamic_index_in_dim(xps, slot, axis=0, keepdims=False)
        x16 = xx.astype(DT)                      # NHWC bf16
        xn = jnp.moveaxis(x16, -1, 1)            # NCHW bf16
        if "bar" in variant:
            xn = lax.optimization_barrier(xn)
        if "enhwc" in variant:
            acts = energy_nhwc(cp, x16)
        elif "eraw" in variant:
            acts = energy_nhwc(cp, xx).astype(jnp.float32)
        else:
            acts = energy_nchw(cp, xn)
        idx = jnp.argmax(acts.astype(jnp.float32), axis=-1)
        if "tpnhwc" in variant:
            x45 = rotate_twopass_nchw(x16, residues[1], "border")
        else:
            x45 = rotate_twopass_from_nchw(xn, residues[1], "border")
        out = select(xn, x45, idx)
        x_c = jnp.moveaxis(out, 1, -1)
        logits = resnet.apply(rps, x_c, training=False)
        return jnp.sum(logits.astype(jnp.float32))
    return step

def bare(rps, xps, slot):
    xx = lax.dynamic_index_in_dim(xps, slot, axis=0, keepdims=False)
    return jnp.sum(resnet.apply(rps, xx, training=False).astype(jnp.float32))

N_LOOP = 24
def timed_ms(fn, *args):
    def run(seed, *a):
        def body(it, s):
            slot = (it + jnp.asarray(s * 0.0, jnp.int32)) % 2
            return fn(*a, slot) * 1e-6 + s * 1e-30
        return lax.fori_loop(0, N_LOOP, body, seed)
    f = jax.jit(run)
    s = f(jnp.float32(0.0), *args); float(s)
    t0 = time.perf_counter(); s = f(s * 0.0, *args); float(s)
    return (time.perf_counter() - t0) / N_LOOP * 1e3

xp2 = jnp.stack([x, x + 1e-6])
VARIANTS = ["bar", "bar_enhwc", "enhwc", "bar_enhwc_tpnhwc", "enhwc_tpnhwc", "eraw_tpnhwc"]
steps = {v: make(v) for v in VARIANTS}
# compile all
tb = timed_ms(bare, rp, xp2)
for v in VARIANTS: timed_ms(steps[v], np_, rp, xp2)
# paired measurement
import collections
res = collections.defaultdict(list)
for _ in range(4):
    tb = timed_ms(bare, rp, xp2)
    for v in VARIANTS:
        tw = timed_ms(steps[v], np_, rp, xp2)
        res[v].append(tw - tb)
for v in VARIANTS:
    d = sorted(res[v])
    print(f"{v:22s} med_overhead={d[len(d)//2]:.3f} min={d[0]:.3f} max={d[-1]:.3f}")
