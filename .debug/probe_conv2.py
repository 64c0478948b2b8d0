"""Extraction conv reformulations on TPU.

- gconv_d: current form, feature_group_count=2D depthwise ([1, R, 2D])
- conv_allarms: [D, R, 2] x [K, 1, 64] groups=2 (all 32 arms on MXU),
  then one-hot arm select [D,S,32]x[D,32]
- also at the header region size to expose fixed overheads
"""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

D, K, A = 512, 297, 32
rng = np.random.default_rng(0)
arm_table = jnp.asarray(rng.standard_normal((A, K)).astype(np.float32))
arm_idx = jnp.asarray(rng.integers(0, A, D).astype(np.int32))


def mk_allarms(R):
    S = (R - K) // 4 + 1
    rr = jnp.asarray(rng.standard_normal((D, R)).astype(np.float32))
    ri = jnp.asarray(rng.standard_normal((D, R)).astype(np.float32))
    # kernel [K, 1, 64]: groups=2 -> group0 (I) outputs 32 arms, group1 (Q)
    kern = jnp.concatenate([arm_table.T[:, None, :]] * 2, axis=2)

    @jax.jit
    def f(rr, ri, arm_idx):
        inp = jnp.stack([rr, ri], axis=-1)  # [D, R, 2]
        out = jax.lax.conv_general_dilated(
            inp, kern, window_strides=(4,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=2,
            preferred_element_type=jnp.float32,
        )  # [D, S, 64]
        oh = jax.nn.one_hot(arm_idx, A, dtype=jnp.float32)  # [D, 32]
        oi = jnp.einsum("dsa,da->ds", out[..., :A], oh)
        oq = jnp.einsum("dsa,da->ds", out[..., A:], oh)
        return oi.sum() + oq.sum()

    return f, rr, ri


def mk_gconv(R):
    rr = jnp.asarray(rng.standard_normal((D, R)).astype(np.float32))
    ri = jnp.asarray(rng.standard_normal((D, R)).astype(np.float32))
    kern = jnp.asarray(rng.standard_normal((K, 1, 2 * D)).astype(np.float32))

    @jax.jit
    def f(rr, ri):
        inp = jnp.concatenate([rr, ri], axis=0).T[None]
        out = jax.lax.conv_general_dilated(
            inp, kern, window_strides=(4,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=2 * D,
            preferred_element_type=jnp.float32,
        )
        return out.sum()

    return f, rr, ri


def timeit(name, fn, *args, iters=10):
    t0 = time.time(); out = jax.block_until_ready(fn(*args)); comp = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(json.dumps({"probe": name,
                      "ms": round((time.time() - t0) / iters * 1e3, 3),
                      "compile_s": round(comp, 1)}), flush=True)


for R, tag in [(6252, "pay"), (1061, "hdr")]:
    f, rr, ri = mk_allarms(R)
    timeit(f"allarms_{tag}", f, rr, ri, arm_idx)
    g, rr2, ri2 = mk_gconv(R)
    timeit(f"gconv_{tag}", g, rr2, ri2)
