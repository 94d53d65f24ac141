import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import importlib.util
spec = importlib.util.spec_from_file_location("exp14", "/root/repo/.scratch/exp14.py")
# just re-use pieces inline instead
from equiadapt_tpu.ops.warp import _twopass_matrices
from equiadapt_tpu.ops.pallas.select_warp import _c_n_decomposition, _pallas_selectn
from equiadapt_tpu.utils.profiling import profile_trace, device_op_attribution
B,H,W,C=256,224,224,3; NUM_ROT=8; N_LOOP=24
rng=np.random.default_rng(0)
x16=jnp.asarray(rng.normal(size=(B,H,W,C)).astype(np.float32)).astype(jnp.bfloat16)
residues,src_of,k_of=_c_n_decomposition(NUM_ROT,-1.0)
idx=jnp.asarray(rng.integers(0,NUM_ROT,size=(B,)).astype(np.int32))
src_idx=jnp.asarray(src_of,jnp.int32)[idx]; k_idx=jnp.asarray(k_of,jnp.int32)[idx]
def pool2(a,eps=1e-6): return jnp.stack([a,a+jnp.asarray(eps,a.dtype)])
def pick(p,slot): return lax.dynamic_index_in_dim(p,slot,axis=0,keepdims=False)
def twopass_bcyx(x,angle,padding_mode="border"):
    dt=x.dtype; M1,M2=_twopass_matrices(H,W,angle,padding_mode,dt)
    V=jnp.einsum("yhw,bhwc->ywbc",M1,x,preferred_element_type=jnp.float32)
    return jnp.einsum("ywx,ywbc->bcyx",M2,V.astype(dt),preferred_element_type=jnp.float32).astype(dt)
def chain_cur(xps,si,ki,slot):
    xx=pick(xps,slot); xn=jnp.moveaxis(xx,-1,1)
    out=_pallas_selectn((xn,twopass_bcyx(xx,45.0)),si,ki,strategy="mixed")
    return jnp.sum(out.astype(jnp.float32))
xp=pool2(x16)
def run(seed,*a):
    def body(it,s):
        slot=(it+jnp.asarray(s*0.0,jnp.int32))%2
        return chain_cur(*a,slot)*1e-6+s*1e-30
    return lax.fori_loop(0,N_LOOP,body,seed)
f=jax.jit(run)
s=f(jnp.float32(0.0),xp,src_idx,k_idx); float(s)
with profile_trace("/tmp/attr14"):
    float(f(jnp.float32(0.0),xp,src_idx,k_idx))
for name,ms in device_op_attribution("/tmp/attr14",top=16):
    print(f"{ms/N_LOOP:8.4f} ms  {name[:110]}")
