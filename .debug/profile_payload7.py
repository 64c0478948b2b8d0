"""Same-process comparison: conv with fresh inputs vs produced inputs."""
import json, sys, time
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

def conv_of(inp):
    kern = jnp.tile(taps[:, ::-1].T[:, None, :], (1, 1, 2))
    return jax.lax.conv_general_dilated(
        inp, kern, window_strides=(SPS,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=2 * D, preferred_element_type=jnp.float32)[0]

def derot_regions(xr, xi, st, freq):
    ridx = jnp.clip(st[:, None] + jnp.arange(REGION, dtype=jnp.int32), 0, T - 1)
    rr, ri = xr[ridx], xi[ridx]
    ph = -freq[:, None] * jnp.arange(REGION, dtype=jnp.float32)[None, :]
    cph, sph = jnp.cos(ph), jnp.sin(ph)
    return rr * cph - ri * sph, rr * sph + ri * cph

f1 = jax.jit(lambda a, b, c, d: jax.vmap(derot_regions)(a, b, c, d))
f2 = jax.jit(lambda dr, di: jax.vmap(lambda r, i: conv_of(jnp.concatenate([r, i], axis=0).T[None]))(dr, di))

def timeit(name, thunk):
    out = jax.block_until_ready(thunk())
    t0 = time.time()
    for _ in range(ITERS): out = thunk()
    jax.block_until_ready(out)
    print(json.dumps({"part": name, "ms": round((time.time()-t0)/ITERS*1e3, 3)}), flush=True)

dr0, di0 = jax.block_until_ready(f1(xr, xi, st, fr))
# fresh numpy copies of the same values
dr_np = jnp.asarray(np.asarray(dr0).copy())
di_np = jnp.asarray(np.asarray(di0).copy())
timeit("f1_alone", lambda: f1(xr, xi, st, fr))
timeit("f2_on_fresh_numpy", lambda: f2(dr_np, di_np))
timeit("f2_on_f1_output", lambda: f2(*f1(xr, xi, st, fr)))
# random inputs as in payload4
dr_r = jnp.asarray(rng.standard_normal((CH, D, REGION)).astype(np.float32))
di_r = jnp.asarray(rng.standard_normal((CH, D, REGION)).astype(np.float32))
timeit("f2_on_random", lambda: f2(dr_r, di_r))
