"""How expensive are cos/sin and the grouped conv on this TPU?

- trig_full: cos+sin over [512, 6252] (the payload derotation shape)
- mul_full: 4 multiplies + 2 adds over the same shape (the factorized form)
- gconv: the extraction's grouped conv [1, R, 2D] x [K, 1, 2D], groups=2D
- gconv_nchw etc variants if quick
"""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

D, R, K, S = 512, 6252, 297, 1540
rng = np.random.default_rng(0)
a = jnp.asarray(rng.standard_normal(D).astype(np.float32))
b = jnp.asarray((rng.standard_normal(D) * 1e-3).astype(np.float32))
rr = jnp.asarray(rng.standard_normal((D, R)).astype(np.float32))
ri = jnp.asarray(rng.standard_normal((D, R)).astype(np.float32))
kern = jnp.asarray(rng.standard_normal((K, 1, 2 * D)).astype(np.float32))


@jax.jit
def trig_full(a, b, rr, ri):
    j = jnp.arange(R, dtype=jnp.float32)[None, :]
    ph = a[:, None] + b[:, None] * j
    c, s = jnp.cos(ph), jnp.sin(ph)
    return (rr * c - ri * s).sum() + (rr * s + ri * c).sum()


@jax.jit
def factored(a, b, rr, ri):
    chunk = 512
    nq = -(-R // chunk)
    r = jnp.arange(chunk, dtype=jnp.float32)
    cr, sr = jnp.cos(b[:, None] * r), jnp.sin(b[:, None] * r)  # [D, chunk]
    q = jnp.arange(nq, dtype=jnp.float32) * chunk
    aq = a[:, None] + b[:, None] * q
    cq, sq = jnp.cos(aq), jnp.sin(aq)  # [D, nq]
    c = (cq[:, :, None] * cr[:, None, :] - sq[:, :, None] * sr[:, None, :])
    s = (cq[:, :, None] * sr[:, None, :] + sq[:, :, None] * cr[:, None, :])
    c = c.reshape(D, nq * chunk)[:, :R]
    s = s.reshape(D, nq * chunk)[:, :R]
    return (rr * c - ri * s).sum() + (rr * s + ri * c).sum()


@jax.jit
def gconv(rr, ri, kern):
    inp = jnp.concatenate([rr, ri], axis=0).T[None]  # [1, R, 2D]
    out = jax.lax.conv_general_dilated(
        inp, kern, window_strides=(4,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=2 * D,
        preferred_element_type=jnp.float32,
    )
    return out.sum()


def timeit(name, fn, *args, iters=10):
    t0 = time.time(); out = jax.block_until_ready(fn(*args)); comp = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(json.dumps({"probe": name,
                      "ms": round((time.time() - t0) / iters * 1e3, 3),
                      "compile_s": round(comp, 1),
                      "val": float(np.asarray(out))}), flush=True)


timeit("trig_full", trig_full, a, b, rr, ri)
timeit("factored", factored, a, b, rr, ri)
timeit("gconv", gconv, rr, ri, kern)
