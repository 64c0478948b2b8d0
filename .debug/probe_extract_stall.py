"""Two TPU probes:
A) is per-detection extraction stall-bound on device-computed starts?
   Times _extract_symbols-like slicing+conv with (a) starts derived from a
   device computation vs (b) host-constant starts baked into the trace.
B) does Mosaic accept make_async_copy with 1024-aligned slice SHAPE and
   dynamic (unaligned) starts?
"""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

T = 1 << 23  # flat plane comparable to 16ch x 2^19
D = 512
R = 6252  # payload region length
rng = np.random.default_rng(0)
xr = jnp.asarray(rng.standard_normal(T).astype(np.float32))
xi = jnp.asarray(rng.standard_normal(T).astype(np.float32))
starts_np = np.sort(rng.integers(0, T - R - 2048, D)).astype(np.int32)
starts_dev = jnp.asarray(starts_np)


def slices_sum(xr, xi, starts):
    rr = jax.vmap(lambda s: jax.lax.dynamic_slice(xr, (s,), (R,)))(starts)
    ri = jax.vmap(lambda s: jax.lax.dynamic_slice(xi, (s,), (R,)))(starts)
    return rr.sum() + ri.sum()


# (a) device-dependent starts: derived from a reduction over x (cannot be
# constant-folded)
@jax.jit
def dev_starts(xr, xi, s0):
    s = (s0 + (xr[:1024].sum() * 0).astype(jnp.int32)).astype(jnp.int32)
    return slices_sum(xr, xi, s)


# (b) host-constant starts baked into the HLO
@jax.jit
def const_starts(xr, xi):
    return slices_sum(xr, xi, jnp.asarray(starts_np))


def timeit(name, fn, *args, iters=10):
    t0 = time.time(); out = jax.block_until_ready(fn(*args)); comp = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(json.dumps({"probe": name, "ms": round((time.time() - t0) / iters * 1e3, 3),
                      "compile_s": round(comp, 1)}), flush=True)


timeit("dev_starts", dev_starts, xr, xi, starts_dev)
timeit("const_starts", const_starts, xr, xi)

# B) aligned-shape DMA fetch
from gr4_packet_modem_tpu.ops.fetch_pallas import fetch_rows
try:
    out = fetch_rows(xr[:65536], jnp.asarray([3, 5170], jnp.int32), 1024)
    jax.block_until_ready(out)
    ref = np.asarray(xr[3:3 + 1024])
    ok = np.array_equal(np.asarray(out[0]), ref)
    print(json.dumps({"probe": "dma_aligned_shape", "compiles": True,
                      "correct": bool(ok)}), flush=True)
except Exception as e:
    print(json.dumps({"probe": "dma_aligned_shape", "compiles": False,
                      "err": str(e)[:200]}), flush=True)
