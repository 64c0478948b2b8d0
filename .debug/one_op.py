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
taps_np = np.ones((32, K), np.float32)
arm = jnp.zeros(D, jnp.int32)
ops = {
  "gather3d": lambda: x[jnp.clip(idx,0,199999)],
  "armgather": lambda: jnp.asarray(taps_np)[arm],
  "einsum_batched": lambda: jnp.einsum("dsk,dk->ds", jnp.ones((D,S,K)), jnp.ones((D,K))),
  "cplx_assemble": lambda: jnp.einsum("dsk,dk->ds", jnp.ones((D,S,K)), jnp.ones((D,K))) + 1j*jnp.ones((D,S)),
  "trig3d": lambda: jnp.cos(jnp.ones((D,S,K))) * jnp.sin(jnp.ones((D,S,K))),
  "scale_complex": lambda: jnp.ones(D)[:,None] * (jnp.ones((D,S)) + 1j*jnp.ones((D,S))),
}
t0=time.time()
try:
    jax.block_until_ready(jax.jit(ops[which])())
    print(f"{which}: OK {time.time()-t0:.1f}s", flush=True)
except Exception as e:
    print(f"{which}: FAIL {str(e)[:90]}", flush=True); sys.exit(1)
