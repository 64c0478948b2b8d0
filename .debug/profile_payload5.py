"""Confirm optimization_barrier breaks the pathological fusion."""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

CH, ITERS, D, S, SPS, K = 8, 10, 32, 6160, 4, 44
BLOCK = 1 << 18
T = 3604 + BLOCK + 30000
REGION = SPS * (S - 1) + K
rng = np.random.default_rng(0)
xr = jnp.asarray(rng.standard_normal((CH, T)).astype(np.float32))
xi = jnp.asarray(rng.standard_normal((CH, T)).astype(np.float32))
st = jnp.asarray(np.sort(rng.integers(0, BLOCK, (CH, D))).astype(np.int32))
fr = jnp.asarray((rng.standard_normal((CH, D)) * 0.01).astype(np.float32))
taps = jnp.asarray(rng.standard_normal((D, K)).astype(np.float32))

def full_conv(xr, xi, st, freq, barrier):
    ridx = jnp.clip(st[:, None] + jnp.arange(REGION, dtype=jnp.int32), 0, T - 1)
    rr, ri = xr[ridx], xi[ridx]
    ph = -freq[:, None] * jnp.arange(REGION, dtype=jnp.float32)[None, :]
    cph, sph = jnp.cos(ph), jnp.sin(ph)
    dr = rr * cph - ri * sph
    di = rr * sph + ri * cph
    if barrier:
        dr, di = jax.lax.optimization_barrier((dr, di))
    kern = jnp.tile(taps[:, ::-1].T[:, None, :], (1, 1, 2))
    inp = jnp.concatenate([dr, di], axis=0).T[None]
    out = jax.lax.conv_general_dilated(
        inp, kern, window_strides=(SPS,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=2 * D, preferred_element_type=jnp.float32)[0]
    return out

def run(name, barrier):
    f = jax.jit(lambda a, b, c, d: jax.vmap(lambda w, x, y, z: full_conv(w, x, y, z, barrier))(a, b, c, d))
    t0 = time.time(); out = jax.block_until_ready(f(xr, xi, st, fr)); comp = time.time() - t0
    t0 = time.time()
    for _ in range(ITERS): out = f(xr, xi, st, fr)
    jax.block_until_ready(out)
    print(json.dumps({"part": name, "ms": round((time.time()-t0)/ITERS*1e3, 3), "compile_s": round(comp,1)}), flush=True)

run("full_conv_nobarrier", False)
run("full_conv_barrier", True)
