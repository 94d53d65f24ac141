"""Can Mosaic lower an in-VMEM dynamic gather? Try take_along_axis variants."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 224, 224

def k_sublane(in_ref, idx_ref, out_ref):
    # gather along axis 0 (sublanes): out[y, x] = in[idx[y, x], x]
    out_ref[:, :] = jnp.take_along_axis(in_ref[:, :], idx_ref[:, :], axis=0)

def k_lane(in_ref, idx_ref, out_ref):
    # gather along axis 1 (lanes): out[y, x] = in[y, idx[y, x]]
    out_ref[:, :] = jnp.take_along_axis(in_ref[:, :], idx_ref[:, :], axis=1)

x = jnp.asarray(np.random.default_rng(0).normal(size=(H, W)).astype(np.float32))
idx = jnp.asarray(np.random.default_rng(1).integers(0, H, size=(H, W)).astype(np.int32))

for name, k in (("sublane-axis0", k_sublane), ("lane-axis1", k_lane)):
    try:
        out = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        )(x, idx)
        ref = jnp.take_along_axis(x, idx, axis=0 if "sub" in name else 1)
        print(name, "OK exact:", bool((out == ref).all()))
    except Exception as e:
        print(name, "FAIL:", str(e).split("\n")[0][:160])
