import sys, time; sys.path.insert(0,'/root/repo')
import numpy as np, jax, jax.numpy as jnp
def t(name, f):
    try:
        r = f()
        print(f"{name}: OK", flush=True); return r
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:90]}", flush=True)
z = jax.jit(lambda: jnp.ones(16, jnp.complex64)*2)()
t("complex_d2h", lambda: np.asarray(z))
t("complex_d2h_planes", lambda: (np.asarray(z.real), np.asarray(z.imag)))
zc = jnp.asarray(np.ones(8, np.complex64))   # host->device
t("complex_const_embed", lambda: np.asarray(jax.jit(lambda x: x + zc)(jnp.zeros(8, jnp.complex64)).real))
t("complex_dynslice", lambda: np.asarray(jax.jit(lambda x,i: jax.lax.dynamic_slice(x,(i,),(4,)))(z, jnp.int32(3)).real))
t("complex_scan", lambda: np.asarray(jax.jit(lambda x: jax.lax.scan(lambda c,s:(c*s, c), jnp.complex64(1), x))(z)[1].real))
t("complex_where", lambda: np.asarray(jnp.where(jnp.arange(16)>4, z, 0).real))
t("complex_dus", lambda: np.asarray(jax.jit(lambda x,i: jax.lax.dynamic_update_slice(x, jnp.zeros(4,jnp.complex64), (i,)))(z, jnp.int32(2)).real))
