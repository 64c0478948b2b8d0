"""Bisect derot vs grouped-conv vs reshape-einsum, materialized outputs."""

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
ITERS = 10
D = 32
S = 6160
SPS = 4
K = 44
BLOCK = 1 << 18
T = 3604 + BLOCK + 30000
REGION = SPS * (S - 1) + K
RL = SPS * S + K  # reshape-friendly region

rng = np.random.default_rng(0)
xr = rng.standard_normal((CH, T)).astype(np.float32)
xi = rng.standard_normal((CH, T)).astype(np.float32)
start = np.sort(rng.integers(0, BLOCK, (CH, D))).astype(np.int32)
freq = (rng.standard_normal((CH, D)) * 0.01).astype(np.float32)
arm_taps = rng.standard_normal((D, K)).astype(np.float32)
# pre-derotated regions for conv-only tests
dr = rng.standard_normal((CH, D, REGION)).astype(np.float32)
di = rng.standard_normal((CH, D, REGION)).astype(np.float32)
dr4 = rng.standard_normal((CH, D, RL)).astype(np.float32)
di4 = rng.standard_normal((CH, D, RL)).astype(np.float32)

j_xr, j_xi = jnp.asarray(xr), jnp.asarray(xi)
j_st, j_fr = jnp.asarray(start), jnp.asarray(freq)
j_dr, j_di = jnp.asarray(dr), jnp.asarray(di)
j_dr4, j_di4 = jnp.asarray(dr4), jnp.asarray(di4)
j_taps = jnp.asarray(arm_taps)


def derot_mat(xr, xi, st, freq):
    ridx = jnp.clip(st[:, None] + jnp.arange(REGION, dtype=jnp.int32), 0, T - 1)
    rr, ri = xr[ridx], xi[ridx]
    ph = -freq[:, None] * jnp.arange(REGION, dtype=jnp.float32)[None, :]
    cph, sph = jnp.cos(ph), jnp.sin(ph)
    return rr * cph - ri * sph, rr * sph + ri * cph


def conv_only(dr, di):
    kern = jnp.tile(j_taps[:, ::-1].T[:, None, :], (1, 1, 2))  # [K,1,2D]
    inp = jnp.concatenate([dr, di], axis=0).T[None]  # [1, R, 2D]
    out = jax.lax.conv_general_dilated(
        inp, kern, window_strides=(SPS,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=2 * D, preferred_element_type=jnp.float32,
    )[0]
    return out


def reshape_einsum(dr, di):
    nsh = K // SPS  # 11
    def frames(reg):
        return jnp.concatenate(
            [reg[:, 4 * t : 4 * t + SPS * S].reshape(D, S, SPS)
             for t in range(nsh)], axis=-1)
    taps_rev = j_taps[:, ::-1]
    fr_r = jnp.einsum("dsk,dk->ds", frames(dr), taps_rev,
                      preferred_element_type=jnp.float32)
    fr_i = jnp.einsum("dsk,dk->ds", frames(di), taps_rev,
                      preferred_element_type=jnp.float32)
    return fr_r, fr_i


def full_reshape(xr, xi, st, freq):
    ridx = jnp.clip(st[:, None] + jnp.arange(RL, dtype=jnp.int32), 0, T - 1)
    rr, ri = xr[ridx], xi[ridx]
    ph = -freq[:, None] * jnp.arange(RL, dtype=jnp.float32)[None, :]
    cph, sph = jnp.cos(ph), jnp.sin(ph)
    dr = rr * cph - ri * sph
    di = rr * sph + ri * cph
    nsh = K // SPS
    def frames(reg):
        return jnp.concatenate(
            [reg[:, 4 * t : 4 * t + SPS * S].reshape(D, S, SPS)
             for t in range(nsh)], axis=-1)
    taps_rev = j_taps[:, ::-1]
    fr_r = jnp.einsum("dsk,dk->ds", frames(dr), taps_rev,
                      preferred_element_type=jnp.float32)
    fr_i = jnp.einsum("dsk,dk->ds", frames(di), taps_rev,
                      preferred_element_type=jnp.float32)
    return fr_r, fr_i


def run(name, fn, args):
    f = jax.jit(lambda *a: jax.vmap(fn)(*a))
    t0 = time.time()
    out = jax.block_until_ready(f(*args))
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(ITERS):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / ITERS
    print(json.dumps({"part": name, "ms": round(dt * 1e3, 3),
                      "compile_s": round(comp, 1)}), flush=True)


parts = os.environ.get("PARTS", "derot,conv,reshape,full_reshape").split(",")
if "derot" in parts:
    run("gather+derot_mat", derot_mat, (j_xr, j_xi, j_st, j_fr))
if "conv" in parts:
    run("conv_only", conv_only, (j_dr, j_di))
if "reshape" in parts:
    run("reshape_einsum", reshape_einsum, (j_dr4, j_di4))
if "full_reshape" in parts:
    run("full_reshape", full_reshape, (j_xr, j_xi, j_st, j_fr))
