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

def lmap_single():
    def f(st):
        return jax.lax.dynamic_slice(x, (st,), (region_len,))
    return jax.lax.map(f, start)

def lmap_tuple():
    def f(st):
        return (jax.lax.dynamic_slice(x, (st,), (region_len,)),
                jax.lax.dynamic_slice(x, (st,), (region_len,)))
    return jax.lax.map(f, start)

def grouped_conv():
    inp = jnp.zeros((1, region_len, 2*D), jnp.float32)
    kern = jnp.ones((kk, 1, 2*D), jnp.float32)
    return jax.lax.conv_general_dilated(inp, kern, (sps,), "VALID",
        dimension_numbers=("NWC","WIO","NWC"), feature_group_count=2*D,
        preferred_element_type=jnp.float32)

def onehot_matmul():
    arm = jnp.zeros(D, jnp.int32)
    taps = jnp.ones((32, kk), jnp.float32)
    return jax.nn.one_hot(arm, 32, dtype=jnp.float32) @ taps

ops = {"lmap_single": lmap_single, "lmap_tuple": lmap_tuple,
       "grouped_conv": grouped_conv, "onehot_matmul": onehot_matmul}
t0=time.time()
try:
    jax.block_until_ready(jax.jit(ops[which])())
    print(f"{which}: OK {time.time()-t0:.1f}s", flush=True)
except Exception as e:
    print(f"{which}: FAIL {str(e)[:90]}", flush=True); sys.exit(1)
