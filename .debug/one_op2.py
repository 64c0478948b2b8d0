import sys, time
sys.path.insert(0,'/root/repo')
import numpy as np, jax, jax.numpy as jnp
which = sys.argv[1]
try:
    jax.block_until_ready(jax.jit(lambda: jnp.arange(4)*2)())
except Exception:
    print(f"{which}: POISONED", flush=True); sys.exit(3)
D, S, K = 32, 192, 44
x = jnp.zeros(200000, jnp.float32)
idx = (jnp.arange(D, dtype=jnp.int32)[:,None,None]*100 + 4*jnp.arange(S, dtype=jnp.int32)[None,:,None] - jnp.arange(K, dtype=jnp.int32)[None,None,:] + 900)
idx2 = jnp.clip(idx,0,199999).reshape(D, S*K)
taps_np = np.ones((32, K), np.float32)
arm = jnp.zeros(D, jnp.int32)
ops = {
  "gather2d_reshape": lambda: x[idx2].reshape(D,S,K),
  "armgather": lambda: jnp.asarray(taps_np)[arm],
}
t0=time.time()
try:
    jax.block_until_ready(jax.jit(ops[which])())
    print(f"{which}: OK {time.time()-t0:.1f}s", flush=True)
except Exception as e:
    print(f"{which}: FAIL {str(e)[:90]}", flush=True); sys.exit(1)
