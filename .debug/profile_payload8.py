"""A/B: fetch {fancy,vslice} x derot {pre,post}, realistic, 3 repeats."""
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
n0 = st  # stand-in for det.index
taps = jnp.asarray(rng.standard_normal((D, K)).astype(np.float32))


def fetch_fancy(xr, xi, start):
    ridx = jnp.clip(start[:, None] + jnp.arange(REGION, dtype=jnp.int32), 0, T - 1)
    return xr[ridx], xi[ridx]


def fetch_vslice(xr, xi, start):
    start = jnp.clip(start, 0, T - REGION)
    def one(s):
        return (jax.lax.dynamic_slice(xr, (s,), (REGION,)),
                jax.lax.dynamic_slice(xi, (s,), (REGION,)))
    return jax.vmap(one)(start)


def extract(xr, xi, start, freq, n0, fetch, mode):
    rr, ri = fetch(xr, xi, start)
    taps_rev = taps[:, ::-1]
    if mode == "pre":
        j = jnp.arange(REGION, dtype=jnp.float32)[None, :]
        ph = -freq[:, None] * (start[:, None].astype(jnp.float32) + j - n0[:, None].astype(jnp.float32))
        cph, sph = jnp.cos(ph), jnp.sin(ph)
        dr = rr * cph - ri * sph
        di = rr * sph + ri * cph
        kern = jnp.tile(taps_rev.T[:, None, :], (1, 1, 2))
        inp = jnp.concatenate([dr, di], axis=0).T[None]
        out = jax.lax.conv_general_dilated(
            inp, kern, window_strides=(SPS,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=2 * D, preferred_element_type=jnp.float32)[0]
        return out[:, :D].T, out[:, D:].T
    # post: modulated taps + per-symbol post-rotation (exact identity)
    k = jnp.arange(K, dtype=jnp.float32)[None, :]
    hr = taps_rev * jnp.cos(-freq[:, None] * k)
    hi = taps_rev * jnp.sin(-freq[:, None] * k)
    kern = jnp.concatenate([hr.T[:, None, :]] * 2 + [hi.T[:, None, :]] * 2, axis=2)  # [K,1,4D]
    inp = jnp.concatenate([rr, ri, rr, ri], axis=0).T[None]  # [1,R,4D]
    out = jax.lax.conv_general_dilated(
        inp, kern, window_strides=(SPS,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=4 * D, preferred_element_type=jnp.float32)[0]
    cr = out[:, :D].T - out[:, 3*D:].T        # conv(rr,hr) - conv(ri,hi)
    ci = out[:, 2*D:3*D].T + out[:, D:2*D].T  # conv(rr,hi) + conv(ri,hr)
    s_idx = jnp.arange(S, dtype=jnp.float32)[None, :]
    ph = -freq[:, None] * (start[:, None].astype(jnp.float32) + SPS * s_idx - n0[:, None].astype(jnp.float32))
    cph, sph = jnp.cos(ph), jnp.sin(ph)
    return cr * cph - ci * sph, cr * sph + ci * cph


for fetch_name, fetch in [("fancy", fetch_fancy), ("vslice", fetch_vslice)]:
    for mode in ["pre", "post"]:
        f = jax.jit(lambda a, b, c, d, e, _fe=fetch, _m=mode: jax.vmap(
            lambda w, x, y, z, u: extract(w, x, y, z, u, _fe, _m))(a, b, c, d, e))
        t0 = time.time(); out = jax.block_until_ready(f(xr, xi, st, fr, n0)); comp = time.time() - t0
        times = []
        for rep in range(3):
            t0 = time.time()
            for _ in range(ITERS): out = f(xr, xi, st, fr, n0)
            jax.block_until_ready(out)
            times.append(round((time.time()-t0)/ITERS*1e3, 3))
        print(json.dumps({"part": f"{fetch_name}/{mode}", "ms": times,
                          "compile_s": round(comp, 1)}), flush=True)
