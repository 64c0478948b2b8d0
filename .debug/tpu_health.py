"""One-shot TPU tunnel health check: trivial jit with a short deadline."""
import sys, time
import jax, jax.numpy as jnp

t0 = time.time()
x = jnp.arange(8.0)
y = jax.jit(lambda a: (a * 2 + 1).sum())(x)
jax.block_until_ready(y)
print(f"healthy val={float(y)} dt={time.time()-t0:.1f}s backend={jax.default_backend()}")
