import sys; sys.path.insert(0,'/root/repo')
import numpy as np, jax, jax.numpy as jnp, time
def t(name, f):
    t0=time.time()
    try:
        jax.block_until_ready(jax.jit(f)())
        print(f"{name}: OK {time.time()-t0:.1f}s", flush=True)
        return True
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:100]}", flush=True)
        return False

x = jnp.ones(32768, jnp.complex64)
idx = jnp.arange(18)[:,None]*1752 + jnp.arange(2048)[None,:]
if not t("gather_complex", lambda: x[idx]): sys.exit()
if not t("fft18", lambda: jnp.fft.fft(jnp.ones((18,2048), jnp.complex64))): sys.exit()
if not t("ifft3d", lambda: jnp.fft.ifft(jnp.ones((18,9,2048), jnp.complex64))): sys.exit()
if not t("prod_bcast", lambda: jnp.ones((18,1,2048),jnp.complex64)*jnp.ones((1,9,2048),jnp.complex64)): sys.exit()
if not t("moveaxis", lambda: jnp.moveaxis(jnp.ones((18,9,1753),jnp.complex64),1,0).reshape(9,-1)): sys.exit()
print("all pieces ok; trying composed", flush=True)
def comp():
    frames = x[idx]
    f = jnp.fft.fft(frames, axis=-1)
    prod = f[:,None,:]*jnp.conj(jnp.fft.fft(jnp.ones((9,2048),jnp.complex64),axis=-1))[None]
    corr = jnp.fft.ifft(prod, axis=-1)[..., :1753]
    return jnp.moveaxis(corr,1,0).reshape(9,-1)
t("composed", comp)
