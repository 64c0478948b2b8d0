"""Compare region-fetch strategies for payload extraction (materialized)."""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

CH = 8
BLOCK = 1 << 18
ITERS = 10
D = 32
S = 6160
SPS = 4
K = 44
T = 3604 + BLOCK + 30000  # ~ front_pad + block + pad_tail
REGION = SPS * (S - 1) + K

rng = np.random.default_rng(0)
xr = rng.standard_normal((CH, T)).astype(np.float32)
xi = rng.standard_normal((CH, T)).astype(np.float32)
start = np.sort(rng.integers(0, BLOCK, (CH, D))).astype(np.int32)

xr_j, xi_j = jnp.asarray(xr), jnp.asarray(xi)
st_j = jnp.asarray(start)


def fancy2d(xr, xi, st):
    ridx = jnp.clip(st[:, None] + jnp.arange(REGION, dtype=jnp.int32), 0, T - 1)
    return xr[ridx], xi[ridx]


def vslice(xr, xi, st):
    st = jnp.clip(st, 0, T - REGION)
    def one(s):
        return (jax.lax.dynamic_slice(xr, (s,), (REGION,)),
                jax.lax.dynamic_slice(xi, (s,), (REGION,)))
    return jax.vmap(one)(st)


def map_slice(xr, xi, st):
    st = jnp.clip(st, 0, T - REGION)
    def one(s):
        return (jax.lax.dynamic_slice(xr, (s,), (REGION,)),
                jax.lax.dynamic_slice(xi, (s,), (REGION,)))
    return jax.lax.map(one, st)


def run(name, fn):
    f = jax.jit(lambda *a: jax.vmap(fn)(*a))
    t0 = time.time()
    out = jax.block_until_ready(f(xr_j, xi_j, st_j))
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(ITERS):
        out = f(xr_j, xi_j, st_j)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / ITERS
    print(json.dumps({"part": name, "ms": round(dt * 1e3, 3),
                      "compile_s": round(comp, 1)}), flush=True)


for name in os.environ.get("PARTS", "vslice,map_slice,fancy2d").split(","):
    run(name, {"fancy2d": fancy2d, "vslice": vslice, "map_slice": map_slice}[name])
