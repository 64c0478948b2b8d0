import sys, time; sys.path.insert(0,'/root/repo')
import numpy as np, jax, jax.numpy as jnp
def t(name, f):
    t0=time.time()
    try:
        jax.block_until_ready(jax.jit(f)())
        print(f"{name}: OK {time.time()-t0:.1f}s", flush=True)
        return True
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:100]}", flush=True)
        return False

x = jnp.zeros(200000, jnp.complex64)
starts = jnp.arange(32, dtype=jnp.int32)*100 + 900
widx = (43 + 4*jnp.arange(192, dtype=jnp.int32)[:,None] - jnp.arange(44, dtype=jnp.int32)[None,:])
region_len = 4*191 + 44

if not t("vmap_dynslice_f32", lambda: jax.vmap(lambda s: jax.lax.dynamic_slice(x.real, (s,), (region_len,)))(starts)): sys.exit()
if not t("vmap_dynslice_cplx_split", lambda: jax.vmap(lambda s: jax.lax.complex(jax.lax.dynamic_slice(x.real,(s,),(region_len,)), jax.lax.dynamic_slice(x.imag,(s,),(region_len,))))(starts)): sys.exit()
def g1():
    r = jax.vmap(lambda s: jax.lax.dynamic_slice(x.real, (s,), (region_len,)))(starts)
    return r[:, widx]  # batched gather [32, 192, 44]
if not t("batched_gather_2didx", g1): sys.exit()
def g2():
    def per(s):
        region = jax.lax.dynamic_slice(x.real, (s,), (region_len,))
        return region[widx]
    return jax.vmap(per)(starts)
if not t("vmapped_inner_gather", g2): sys.exit()
def g3():
    def per(s, fq):
        region = jax.lax.complex(jax.lax.dynamic_slice(x.real,(s,),(region_len,)), jax.lax.dynamic_slice(x.imag,(s,),(region_len,)))
        n_abs = s + jnp.arange(region_len)
        ph = -fq*(n_abs - 900).astype(jnp.float32)
        region = region * jax.lax.complex(jnp.cos(ph), jnp.sin(ph))
        wr = region.real[widx]; wi = region.imag[widx]
        taps = jnp.ones(44, jnp.float32)
        return (wr @ taps) + 1j*(wi @ taps)
    return jax.vmap(per)(starts, jnp.zeros(32))
t("full_per_det", g3)
