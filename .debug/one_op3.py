import sys, time
sys.path.insert(0,'/root/repo')
import numpy as np, jax, jax.numpy as jnp
which = sys.argv[1]
try:
    jax.block_until_ready(jax.jit(lambda: jnp.arange(4)*2)())
except Exception:
    print(f"{which}: POISONED", flush=True); sys.exit(3)
D, chunk, kk, sps = 32, 192, 44, 4
region_len = sps*(chunk-1)+kk
x = jnp.zeros(200000, jnp.float32)
start = jnp.arange(D, dtype=jnp.int32)*100 + 900
reg = jnp.zeros((D, region_len), jnp.float32)

def strided():
    cols = [jax.lax.slice_in_dim(reg, kk-1-k2, kk-1-k2+sps*(chunk-1)+1, stride=sps, axis=1) for k2 in range(kk)]
    return jnp.stack(cols, axis=-1)

def lmap():
    def f(st):
        return (jax.lax.dynamic_slice(x, (st,), (region_len,)),
                jax.lax.dynamic_slice(x, (st,), (region_len,)))
    return jax.lax.map(f, start)

def lmap_single():
    def f(st):
        return jax.lax.dynamic_slice(x, (st,), (region_len,))
    return jax.lax.map(f, start)

def windows_einsum():
    w = strided()
    taps = jnp.ones((D, kk), jnp.float32)
    return jnp.einsum("dsk,dk->ds", w, taps)

ops = {"strided": strided, "lmap": lmap, "lmap_single": lmap_single, "windows_einsum": windows_einsum}
t0=time.time()
try:
    jax.block_until_ready(jax.jit(ops[which])())
    print(f"{which}: OK {time.time()-t0:.1f}s", flush=True)
except Exception as e:
    print(f"{which}: FAIL {str(e)[:90]}", flush=True); sys.exit(1)
